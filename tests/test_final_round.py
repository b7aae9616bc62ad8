"""Final-round pipeline (src/Optimiser.cpp:4075-4363): Nyquist
reconstruction without hemisphere averaging, joined Cref map + final file
set, masked-region signal subtraction, and the auto-recentring O
accumulator (insertDir/allReduceO, src/Optimiser.cpp:7227,
src/Reconstructor.cpp:2455-2520)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thunder_tpu.geom import quat
from thunder_tpu.io.thu import read_thu
from thunder_tpu.parallel.mesh import make_mesh

from test_engine import _build, _dataset, B, N

# heavy e2e fixtures: deselect with -m 'not slow' for the fast unit path
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    vol, imgs, cp = _dataset()
    opt = _build(make_mesh(), vol, imgs, cp)
    out = tmp_path_factory.mktemp("final")
    opt.para.output_directory = str(out)
    opt.run_iteration()
    opt.run_iteration()
    return opt, out, vol


def test_finalise_writes_final_set(trained):
    opt, out, vol = trained
    opt.para.save_ref_each_iter = True
    opt.para.save_thu_each_iter = True
    opt.finalise()
    assert (out / "Reference_000_Final.mrc").exists()
    assert (out / "Reference_000_A_Final.mrc").exists()
    assert (out / "Meta_Final.thu").exists()
    assert (out / "FSC_Final.txt").exists()
    # the joined map reconstructs at Nyquist and matches the phantom at
    # low-mid shells
    from thunder_tpu.ops import fft, spectrum

    fsc = np.asarray(spectrum.frc_fsc(
        fft.fft3_center(jnp.asarray(opt.joined_maps[0])),
        fft.fft3_center(jnp.asarray(vol)), N // 2, 3))
    assert np.all(fsc[1:5] > 0.5), fsc


def test_subtract_removes_signal(trained):
    opt, out, _ = trained
    opt.para.subtract = True
    opt.para.region_centre = ""
    opt._subtract_pipeline()
    name = out / "Subtract_Rank_000000.mrcs"
    assert name.exists()
    from thunder_tpu.io import read_mrc

    stack = read_mrc(str(name))
    g = 1 + opt.sym.n_elements
    assert stack.shape == (g * B, N, N)
    # subtracting the full (sphere-masked) reference leaves ~noise: most of
    # the stack power disappears and the residual decorrelates from the
    # observed images
    from thunder_tpu.ops import fft as fft_ops

    imgs = opt._from_plane(np.asarray(
        fft_ops.ifft2_center(opt.imgs_ft_ori).real))
    p_obs = float((imgs**2).mean())
    p_sub = float((stack[:B] ** 2).mean())
    assert p_sub < 0.4 * p_obs, (p_sub, p_obs)
    corr = np.mean([np.corrcoef(imgs[i].ravel(), stack[i].ravel())[0, 1]
                    for i in range(8)])
    assert abs(corr) < 0.3, corr
    # Meta_Subtract holds (1+G) rows per image, image-major, each pointing
    # at its symmetry-expanded slice (src/Optimiser.cpp:8296-8361)
    t = read_thu(str(out / "Meta_Subtract.thu"))
    assert len(t) == g * B
    assert t.particle_paths[0].startswith("1@")
    # image 0's rows reference slices {1, B+1, 2B+1, ...}
    got = [int(t.particle_paths[gi].split("@")[0]) for gi in range(g)]
    assert got == [gi * B + 1 for gi in range(g)]
    # identity row's quaternion is the rank-1 pose (up to sign)
    from thunder_tpu.io.thu import ThuColumns

    q0 = t.values[0, ThuColumns.QUAT_0:ThuColumns.QUAT_3 + 1]
    q_top = opt.best_quat[0]
    assert min(np.abs(q0 - q_top).max(), np.abs(q0 + q_top).max()) < 1e-4


def test_insert_offsets_track_translation_bias():
    """A constant translation bias t0 on every particle accumulates
    O = mean(-rot @ (t0, 0)) and auto-recentre shifts the reference."""
    vol, imgs, cp = _dataset(seed=5)
    opt = _build(make_mesh(), vol, imgs, cp)
    t0 = np.array([1.5, -0.8], np.float32)
    qs = np.asarray(quat.random_quat(jax.random.PRNGKey(9), B))
    opt.load_poses(qs, np.tile(t0, (B, 1)))
    opt.reconstruct()
    rots = np.asarray(quat.rotate3d(jnp.asarray(qs)))
    expect = -(rots @ np.array([t0[0], t0[1], 0.0], np.float32)).mean(axis=0)
    got = opt.insert_offsets[:, 0]  # (2, 3), C1 so no symmetrization
    np.testing.assert_allclose(got.mean(axis=0), expect, atol=0.25)
