"""Hermitian half-space brick tables (ops.brick.pack_vol3_half).

The E-step's dominant cost is the row gather from the brick projection
table; v5e gathers at ~5.15 ns/idx from tables < 4M rows and ~14.8 ns/idx
above (scripts/gather_size_probe.py). The half-space table halves the
rows using F(-k) = conj(F(k)) — the reference projector's own
conjugate-mirror fetch (src/Projector.cpp:222-356). These tests pin the
exactness claims:

- on an EXACTLY Hermitian spectrum the half gather equals the full gather
  to f32 round-off (identical interpolation dot, conjugation is a sign),
- on the real production table (FFT of a real volume) it matches to the
  FFT's own numerical asymmetry,
- the engine's fused class gather and the projector entry point agree
  between full and half tables, including mirrored (z < 0) samples and
  the bf16 packing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thunder_tpu.core import projector
from thunder_tpu.geom import quat
from thunder_tpu.ops import brick
from thunder_tpu.parallel.engine import _brick_geom, _fused_class_gather


def _hermitian_spectrum(rng, mc):
    """Random exactly-Hermitian centered spectrum on an odd grid."""
    x = rng.normal(size=(mc, mc, mc)) + 1j * rng.normal(size=(mc, mc, mc))
    h = (x + np.conj(x[::-1, ::-1, ::-1])) / 2
    return jnp.asarray(h.astype(np.complex64))


def _ball_coords(rng, n, radius):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = radius * rng.uniform(0, 1, size=(n, 1)) ** (1 / 3)
    return jnp.asarray((v * r).astype(np.float32))


def test_half_gather_exact_on_hermitian_spectrum():
    rng = np.random.default_rng(0)
    mc = 33
    ft = _hermitian_spectrum(rng, mc)
    full = brick.pack_vol3(ft)
    half = brick.pack_vol3_half(ft)
    assert half.shape == (mc // 2 + 1, mc, mc, 16)
    coords = _ball_coords(rng, 4096, mc // 2 - 2)
    a = brick.gather_vol3(full, coords)
    b = brick.gather_vol3_half(half, coords)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    # mirrored samples really exercise the conjugate path
    assert np.asarray(coords)[:, 0].min() < 0


def test_half_gather_bf16_packing():
    rng = np.random.default_rng(1)
    mc = 33
    ft = _hermitian_spectrum(rng, mc)
    full = brick.pack_vol3(ft, dtype=jnp.bfloat16)
    half = brick.pack_vol3_half(ft, dtype=jnp.bfloat16)
    assert half.shape == (mc // 2 + 1, mc, mc, 8)
    coords = _ball_coords(rng, 2048, mc // 2 - 2)
    a = brick.gather_vol3(full, coords)
    b = brick.gather_vol3_half(half, coords)
    # bf16(conj(x)) == conj(bf16(x)): packing commutes with the mirror
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_project_brick_3d_auto_detects_half():
    rng = np.random.default_rng(2)
    n, r_max = 24, 8
    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    tf = projector.build_brick_projectee_3d(vol, r_max, pf=2)
    th = projector.build_brick_projectee_3d(vol, r_max, pf=2, half=True)
    rots = quat.rotate3d(quat.random_quat(jax.random.PRNGKey(0), 5))
    fr = np.arange(n) - n // 2
    cg, rg = np.meshgrid(fr, fr, indexing="xy")
    sel = (cg**2 + rg**2) <= r_max**2
    col = jnp.asarray(cg[sel].astype(np.float32))
    row = jnp.asarray(rg[sel].astype(np.float32))
    a = projector.project_brick_3d(tf, rots, col, row, pf=2)
    b = projector.project_brick_3d(th, rots, col, row, pf=2)
    # production tables come from an f32 FFT of a real volume: halves
    # agree to the FFT's numerical Hermitian asymmetry
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4 * float(jnp.abs(a).max()))


def test_fused_class_gather_half_matches_full():
    rng = np.random.default_rng(3)
    mc, k_cls, b, r_sup, p = 21, 3, 6, 4, 256
    fts = [_hermitian_spectrum(rng, mc) for _ in range(k_cls)]
    full = jnp.stack([brick.pack_vol3(f) for f in fts])
    half = jnp.stack([brick.pack_vol3_half(f) for f in fts])
    assert _brick_geom(full[None], "3d") == (mc, False)
    assert _brick_geom(half[None], "3d") == (mc, True)
    coords = _ball_coords(rng, b * r_sup * p, mc // 2 - 2).reshape(
        b, r_sup, p, 3)
    cls = jnp.asarray(rng.integers(0, k_cls, size=(b,)).astype(np.int32))
    a = _fused_class_gather(full.reshape(-1, 16), coords, cls, mc, "3d",
                            half=False)
    o = _fused_class_gather(half.reshape(-1, 16), coords, cls, mc, "3d",
                            half=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(o),
                               rtol=1e-5, atol=1e-5)


def test_half_gather_boundary_and_out_of_band():
    """Out-of-band samples return 0 on both paths (validity parity)."""
    rng = np.random.default_rng(4)
    mc = 21
    ft = _hermitian_spectrum(rng, mc)
    full = brick.pack_vol3(ft)
    half = brick.pack_vol3_half(ft)
    coords = jnp.asarray(np.array([
        [mc, 0.0, 0.0], [0.0, -mc, 0.0], [9.4, 9.4, 9.4],
        [-9.4, -9.4, -9.4], [0.0, 0.0, 0.0], [-0.5, 3.2, -1.7],
    ], np.float32))
    a = np.asarray(brick.gather_vol3(full, coords))
    b = np.asarray(brick.gather_vol3_half(half, coords))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert a[0] == 0 and a[1] == 0


# ------------------------------------------------------- radius tiering

def test_tier_gather_matches_single_table():
    """engine._tier_gather: inner pixels from the central crop, outer from
    the big table — equals one big-table gather."""
    from thunder_tpu.core.optimiser import _tier_r_in
    from thunder_tpu.parallel.engine import _tier_gather

    rng = np.random.default_rng(5)
    mc, mc_in = 33, 21
    ft = _hermitian_spectrum(rng, mc)
    big = brick.pack_vol3_half(ft)
    off = mc // 2 - mc_in // 2
    inner = big[: mc_in // 2 + 1, off:off + mc_in, off:off + mc_in, :]
    b, r_sup, p, p_in = 4, 3, 128, 64
    r_inner = mc_in // 2 - 2
    c_in = _ball_coords(rng, b * r_sup * p_in, r_inner)
    c_out = _ball_coords(rng, b * r_sup * (p - p_in), mc // 2 - 2)
    coords = jnp.concatenate(
        [c_in.reshape(b, r_sup, p_in, 3),
         c_out.reshape(b, r_sup, p - p_in, 3)], axis=2)
    cls = jnp.zeros((b,), jnp.int32)
    ref = _tier_gather(big.reshape(-1, 16), None, coords, cls, mc, 0,
                       "3d", True, 0)
    out = _tier_gather(big.reshape(-1, 16), inner.reshape(-1, 16), coords,
                       cls, mc, mc_in, "3d", True, p_in)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)
    # p_in >= P: everything through the inner table
    all_in = _ball_coords(rng, b * r_sup * p, r_inner).reshape(
        b, r_sup, p, 3)
    a2 = _tier_gather(big.reshape(-1, 16), inner.reshape(-1, 16), all_in,
                      cls, mc, mc_in, "3d", True, p)
    r2 = _tier_gather(big.reshape(-1, 16), None, all_in, cls, mc, 0,
                      "3d", True, 0)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(r2),
                               rtol=1e-5, atol=1e-5)
    # tier band selection: under the cliff no tier band needed at 40,
    # r_band 56 tiers at 48 (mc=197 -> 3.84M rows < 4M)
    assert _tier_r_in(56, 2) == 48
    assert _tier_r_in(96, 2) == 48


def test_pixel_ring_sorted_and_n_inner():
    from thunder_tpu.ops import pixels

    ring = pixels.pixel_ring(64, 0, 20)
    u2 = (ring.col.astype(np.int64) ** 2 + ring.row.astype(np.int64) ** 2)
    real = ring.mask > 0
    assert np.all(np.diff(u2[real]) >= 0)  # sorted by radius
    p_in = ring.n_inner(10.0)
    assert 0 < p_in < ring.n_real
    assert np.all(u2[real][:p_in] <= 100)
    assert np.all(u2[real][p_in:] > 100)


def test_refinement_identical_with_forced_tiering(monkeypatch, tmp_path):
    """End-to-end: a refinement iteration with the radius tier FORCED on
    (tiny THUNDER_TIER_ROWS) produces the same posteriors as untiered —
    the tier split is a pure gather-routing change."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_optimiser_e2e import _make_dataset
    from thunder_tpu.config import Para
    from thunder_tpu.core.optimiser import Optimiser

    n = 32
    vol, imgs, quats, trans, ctf_params = _make_dataset(n=n, n_imgs=32)

    def run(tier_env):
        if tier_env:
            monkeypatch.setenv("THUNDER_TIER_ROWS", tier_env)
        else:
            monkeypatch.delenv("THUNDER_TIER_ROWS", raising=False)
        para = Para(mode="3d", k=1, size=n, pixel_size=1.32,
                    mask_radius=n * 1.32 / 2.2, trans_s=2.0,
                    init_res=3.2, global_search_res=2.8, sym="C1",
                    m_s=400, m_l_r=32, m_l_t=9, m_reco=8,
                    trans_search_factor=0.25, l_search=True, pf=2, seed=5)
        opt = Optimiser(para)
        opt.set_data(imgs, ctf_params)
        opt.init_reference(vol=vol)
        opt.init_sigma()
        opt.run(max_iter=1)
        return (np.asarray(opt.par["topR"]), np.asarray(opt.par["topT"]),
                np.asarray(opt.refs[0, 0]), opt._bricks())

    # init_res 3.2 A at 1.32 A/px, n=32 -> r ~= 13: big table mc=69
    # (166k rows), tier band r_in=8 (mc=37, 26k rows) with threshold 1e5
    t_r, t_t, t_map, t_bricks = run("100000")
    assert isinstance(t_bricks, tuple), "tier did not trigger"
    u_r, u_t, u_map, u_bricks = run(None)
    assert not isinstance(u_bricks, tuple)
    np.testing.assert_allclose(t_r, u_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(t_t, u_t, rtol=2e-3, atol=2e-3)
    corr = np.corrcoef(t_map.ravel(), u_map.ravel())[0, 1]
    assert corr > 0.9999, corr
