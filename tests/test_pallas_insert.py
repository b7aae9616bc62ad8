"""Sorted-binned Pallas insert (ops.pallas_insert): kernel vs the XLA
scatter oracle, and engine-level equality of the sorted and scatter
insert_fold_reduce paths (identical draws -> identical folded (F, T) up to
f32 summation order)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thunder_tpu.ops import brick, pallas_insert as pi


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_kernel_matches_scatter_oracle(rng):
    n_rows = 9**3 + 1
    r_pad = pi.rows_pad(n_rows)
    n = 20_000
    idx = jnp.asarray(rng.integers(0, n_rows, n).astype(np.int32))
    fr = jnp.asarray(rng.normal(size=n).astype(np.float32))
    fi = jnp.asarray(rng.normal(size=n).astype(np.float32))
    tv = jnp.asarray(rng.normal(size=n).astype(np.float32))
    frac = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    tab0 = jnp.asarray(rng.normal(size=(24, r_pad)).astype(np.float32))
    ref = pi.reference_insert_update(tab0, idx, fr, fi, tv, frac)
    out = pi.sorted_insert_update(tab0, idx, fr, fi, tv, frac,
                                  interpret=True)
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err / scale < 1e-5, err / scale


def test_kernel_empty_and_all_dropped(rng):
    """No samples in most windows + every sample at the drop row."""
    mc = 9
    n_rows = mc**3 + 1
    r_pad = pi.rows_pad(n_rows)
    n = 1000
    idx = jnp.full((n,), mc**3, jnp.int32)  # all dropped
    z = jnp.zeros((n,), jnp.float32)
    frac = jnp.zeros((n, 3), jnp.float32)
    tab0 = jnp.asarray(rng.normal(size=(24, r_pad)).astype(np.float32))
    out = pi.sorted_insert_update(tab0, idx, z + 1.0, z + 2.0, z + 3.0,
                                  frac, interpret=True)
    # only the drop row may change; folded voxel region untouched
    np.testing.assert_allclose(np.asarray(out[:, :mc**3]),
                               np.asarray(tab0[:, :mc**3]), rtol=0, atol=0)


def test_fold_lane_matches_fold(rng):
    mc = 7
    tab = rng.normal(size=(mc**3 + 1, 24)).astype(np.float32)
    f_a, t_a = brick.fold_insert3(jnp.asarray(tab))
    r_pad = pi.rows_pad(mc**3 + 1)
    lane = np.zeros((24, r_pad), np.float32)
    lane[:, :mc**3 + 1] = tab.T
    f_b, t_b = brick.fold_insert3_lane(jnp.asarray(lane), mc)
    np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_a), np.asarray(t_b), atol=1e-6)


def test_engine_sorted_matches_scatter():
    """insert_fold_reduce with insert_impl='sorted_interpret' must equal
    the scatter path (same keys -> same draws -> same samples)."""
    from thunder_tpu import config
    from thunder_tpu.core import optimiser as opt_mod
    from thunder_tpu.core import particle
    from thunder_tpu.ops import pixels
    from thunder_tpu.parallel import engine
    from thunder_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    n, r_u, pf = 16, 6, 2
    mesh = make_mesh()
    ring = pixels.pixel_ring(n, 0, r_u)
    col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
    pmask = jnp.asarray(ring.mask)
    p = ring.col.shape[0]
    s = 8
    mc = brick.crop_size(r_u, pf)
    dat = jnp.asarray((rng.normal(size=(2, s, p))
                       + 1j * rng.normal(size=(2, s, p))
                       ).astype(np.complex64))
    ctf = jnp.asarray(rng.uniform(0.5, 1.0, (2, s, p)).astype(np.float32))
    st = {
        "r": jnp.asarray(rng.normal(size=(2, s, 5, 4)).astype(np.float32)),
        "t": jnp.asarray(rng.normal(size=(2, s, 3, 2)).astype(np.float32)),
        "c": jnp.zeros((2, s), jnp.int32),
    }
    st["r"] = st["r"] / jnp.linalg.norm(st["r"], axis=-1, keepdims=True)
    keys = engine.plane_keys(jax.random.PRNGKey(0),
                             np.arange(2 * s).reshape(2, s))
    w = jnp.ones((2, s), jnp.float32) / 7
    off = jnp.zeros((2, s, 2), jnp.float32)
    sym = jnp.zeros((0, 3, 3), jnp.float32)
    kw = dict(mode="3d", pf=pf, n=n, k_classes=1, mc=mc, n_draw=7,
              chunk=4, apply_sym=False)
    f_a, t_a, o_a = engine.insert_fold_reduce(
        mesh, col, row, pmask, dat, ctf, st, keys, w, off, sym,
        insert_impl="scatter", **kw)
    f_b, t_b, o_b = engine.insert_fold_reduce(
        mesh, col, row, pmask, dat, ctf, st, keys, w, off, sym,
        insert_impl="sorted_interpret", **kw)
    scale = float(jnp.max(jnp.abs(t_a))) + 1e-12
    assert float(jnp.max(jnp.abs(f_a - f_b))) / scale < 1e-5
    assert float(jnp.max(jnp.abs(t_a - t_b))) / scale < 1e-5
    np.testing.assert_allclose(np.asarray(o_a), np.asarray(o_b),
                               rtol=1e-5, atol=1e-6)


def test_engine_fused_classes_match_staged():
    """k_classes=K fused insert == K staged passes with other classes'
    weights zeroed (the optimiser's fallback path) — 2D scatter and 3D
    sorted-interpret variants."""
    from thunder_tpu.ops import pixels
    from thunder_tpu.parallel import engine
    from thunder_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(9)
    n, r_u, pf, kk = 16, 6, 2, 3
    mesh = make_mesh()
    ring = pixels.pixel_ring(n, 0, r_u)
    col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
    pmask = jnp.asarray(ring.mask)
    p = ring.col.shape[0]
    s = 8
    mc = brick.crop_size(r_u, pf)
    dat = jnp.asarray((rng.normal(size=(2, s, p))
                       + 1j * rng.normal(size=(2, s, p))).astype(np.complex64))
    ctf = jnp.asarray(rng.uniform(0.5, 1.0, (2, s, p)).astype(np.float32))
    cls = jnp.asarray(rng.integers(0, kk, (2, s)).astype(np.int32))
    st = {
        "r": jnp.asarray(rng.normal(size=(2, s, 5, 4)).astype(np.float32)),
        "t": jnp.asarray(rng.normal(size=(2, s, 3, 2)).astype(np.float32)),
        "c": cls,
    }
    st["r"] = st["r"] / jnp.linalg.norm(st["r"], axis=-1, keepdims=True)
    keys = engine.plane_keys(jax.random.PRNGKey(1),
                             np.arange(2 * s).reshape(2, s))
    w = jnp.ones((2, s), jnp.float32) / 5
    off = jnp.zeros((2, s, 2), jnp.float32)
    sym = jnp.zeros((0, 3, 3), jnp.float32)
    for mode, impl in (("3d", "sorted_interpret"), ("3d", "scatter")):
        kw = dict(mode=mode, pf=pf, n=n, mc=mc, n_draw=6, chunk=4,
                  apply_sym=False, insert_impl=impl)
        f_f, t_f, o_f = engine.insert_fold_reduce(
            mesh, col, row, pmask, dat, ctf, st, keys, w, off, sym,
            k_classes=kk, **kw)
        assert f_f.shape[1] == kk
        for k in range(kk):
            w_k = w * (cls == k)
            st1 = {**st, "c": jnp.zeros_like(cls)}
            f_1, t_1, o_1 = engine.insert_fold_reduce(
                mesh, col, row, pmask, dat, ctf, st1, keys, w_k, off, sym,
                k_classes=1, **kw)
            scale = float(jnp.max(jnp.abs(t_1))) + 1e-12
            assert float(jnp.max(jnp.abs(f_f[:, k] - f_1))) / scale < 1e-5
            assert float(jnp.max(jnp.abs(t_f[:, k] - t_1))) / scale < 1e-5
            np.testing.assert_allclose(np.asarray(o_f[:, k]),
                                       np.asarray(o_1[:, 0]),
                                       rtol=1e-5, atol=1e-6)
