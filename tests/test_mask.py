"""gen_mask parity (src/Functions/Mask.cpp:560-811): isolated-point
removal, Euclidean-ball extend, exact-distance cosine soft edge, and the
partial-sum auto-threshold search."""

import numpy as np

from thunder_tpu.ops.mask import (auto_mask, auto_mask_threshold, ext_mask,
                                  gen_mask, remove_isolated_points,
                                  shell_mask, soft_edge)

N = 32


def _ball(r, n=N):
    g = np.mgrid[:n, :n, :n] - n // 2
    return (g[0] ** 2 + g[1] ** 2 + g[2] ** 2 < r**2).astype(np.float32)


def test_remove_isolated_points():
    b = _ball(5)
    b[2, 2, 2] = 1.0  # lone voxel far from the ball
    out = remove_isolated_points(b)
    assert out[2, 2, 2] == 0
    # the ball interior survives
    c = N // 2
    assert out[c, c, c] == 1
    assert out.sum() == b.sum() - 1


def test_ext_mask_euclidean_ball():
    b = np.zeros((N, N, N), np.float32)
    c = N // 2
    b[c, c, c] = 1.0
    out = ext_mask(b, 3.0)
    g = np.mgrid[:N, :N, :N] - c
    d2 = g[0] ** 2 + g[1] ** 2 + g[2] ** 2
    np.testing.assert_array_equal(out, (d2 < 9).astype(np.float32))
    # shrink reverses growth on a solid ball
    shrunk = ext_mask(_ball(8), -3.0)
    grown_back = ext_mask(shrunk, 3.0)
    inner = _ball(5)
    assert (shrunk * inner).sum() / inner.sum() > 0.9


def test_soft_edge_cosine_profile():
    out = soft_edge(_ball(6), 4.0)
    c = N // 2
    # exact values along an axis: d is the distance past the last 1-voxel
    assert out[c, c, c] == 1.0
    line = out[c, c]
    # inside the ball: 1
    assert line[c + 5] == 1.0
    # one voxel past the boundary: 0.5 + 0.5 cos(pi/4)
    first_out = c + 6
    assert abs(line[first_out] - (0.5 + 0.5 * np.cos(np.pi / 4))) < 1e-6
    # beyond the edge width: 0
    assert line[first_out + 4] == 0.0


def test_auto_mask_threshold_finds_density_knee():
    """A two-level phantom (dense core amid weak halo): the partial-sum
    search lands between the two densities."""
    rng = np.random.default_rng(0)
    vol = _ball(5) * 10.0 + _ball(10) * 0.2
    vol += rng.normal(0, 0.01, vol.shape).astype(np.float32)
    thres = auto_mask_threshold(vol, N // 2)
    # the knee sits at the dense-core density, well above the halo
    assert 1.0 < thres < 10.5
    m = gen_mask(vol, thres, 2.0, 3.0)
    c = N // 2
    assert m[c, c, c] == 1.0
    assert m[0, 0, 0] == 0.0
    # covers the dense core (+extension) but not the whole halo
    assert _ball(5).sum() < (m > 0.99).sum() < _ball(9.5).sum()


def test_auto_mask_wrapper_runs():
    m = auto_mask(_ball(6) * 3.0, 2.0, 3.0, N // 2)
    assert m.shape == (N, N, N)
    assert m.max() == 1.0 and m.min() == 0.0


def test_shell_mask_profile():
    m = np.asarray(shell_mask((N, N, N), 6.0, 12.0, 2.0))
    c = N // 2
    line = m[c, c]
    assert line[c] == 0.0          # inside the inner radius - ew
    assert line[c + 9] == 1.0      # inside the shell
    assert line[c + 15] == 0.0     # beyond outer + ew
    assert 0 < line[c + 13] < 1    # outer cosine edge
