"""Sharded engine semantics: the SPMD refinement programs must produce the
same results on a 1-device mesh and an 8-device (half=2, data=4) mesh.

This is the property the reference gets from its MPI determinism contract
(per-rank particle ranges + per-thread RNG engines, src/Database.cpp:621,
src/Parallel.cpp:17-67); here it holds because every random draw is keyed by
the GLOBAL image index (engine.plane_keys) and no E-step computation crosses
images. Reductions (insert psum, stat psum) may reorder float sums across
shards, so reconstructed maps are compared with a small tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thunder_tpu.config import Para
from thunder_tpu.core import projector
from thunder_tpu.core.optimiser import Optimiser
from thunder_tpu.geom import quat
from thunder_tpu.ops import ctf as ctf_ops
from thunder_tpu.ops import fft as fft_ops
from thunder_tpu.ops.mask import soft_mask_shape
from thunder_tpu.ops.translate import translate_ft
from thunder_tpu.parallel.mesh import make_mesh

# heavy e2e fixtures: deselect with -m 'not slow' for the fast unit path
pytestmark = pytest.mark.slow

N = 24
B = 16


def _dataset(seed=0):
    rng = np.random.default_rng(seed)
    vol = np.array(np.asarray(soft_mask_shape((N, N, N), 5.0, 2.5)))
    vol += np.roll(vol, 4, axis=1) * 0.7
    quats = np.asarray(quat.random_quat(jax.random.PRNGKey(1), B))
    rots = quat.rotate3d(jnp.asarray(quats))
    trans = rng.normal(0, 1.0, (B, 2)).astype(np.float32)
    cp = dict(voltage=np.full(B, 300e3), defocus_u=rng.uniform(1e4, 2e4, B),
              defocus_v=rng.uniform(1e4, 2e4, B), defocus_theta=np.zeros(B),
              cs=np.zeros(B), amp_contrast=np.full(B, 0.1),
              phase_shift=np.zeros(B))
    cp = {k: v.astype(np.float32) for k, v in cp.items()}
    ref_ft = projector.build_projectee_3d(jnp.asarray(vol, jnp.float32), pf=2)
    imgs_ft = projector.project_full_3d(ref_ft, rots, N, N // 2 - 2, pf=2)
    f = jnp.arange(N) - N // 2
    colg, rowg = jnp.meshgrid(f, f, indexing="xy")
    c2d = ctf_ops.ctf_pixels(
        colg.reshape(-1).astype(jnp.float32),
        rowg.reshape(-1).astype(jnp.float32), N, 2.0,
        *[jnp.asarray(cp[k])[:, None] for k in
          ("voltage", "defocus_u", "defocus_v", "defocus_theta", "cs",
           "amp_contrast", "phase_shift")]).reshape(B, N, N)
    imgs_ft = translate_ft(imgs_ft * c2d, jnp.asarray(trans[:, 0]),
                           jnp.asarray(trans[:, 1]))
    imgs = np.array(np.asarray(fft_ops.ifft2_center(imgs_ft).real))
    imgs += rng.normal(0, 0.05 * imgs.std(), imgs.shape).astype(np.float32)
    return vol, imgs.astype(np.float32), cp


def _build(mesh, vol, imgs, cp):
    para = Para(size=N, pixel_size=2.0, k=1, mask_radius=22.0, m_s=128,
                m_l_r=16, m_l_t=4, m_l_d=4, m_reco=4, trans_s=1.5,
                init_res=20.0, global_search_res=6.0, sym="C1",
                save_ref_each_iter=False, save_thu_each_iter=False,
                # f32 tables: the strict 1-vs-8-device comparison needs the
                # widest numeric margin — bf16 projection quantization can
                # push a resampling draw onto a tie that psum ordering then
                # flips differently across layouts (a pick flip, not drift)
                image_batch=2, seed=3, table_bf16=False)
    opt = Optimiser(para, mesh=mesh)
    opt.set_data(imgs, cp)
    opt.init_reference(vol)
    opt.init_sigma()
    return opt


@pytest.fixture(scope="module")
def pair():
    vol, imgs, cp = _dataset()
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")
    o1 = _build(make_mesh(n_devices=1), vol, imgs, cp)
    o8 = _build(make_mesh(n_devices=8), vol, imgs, cp)
    return o1, o8


def test_one_iteration_matches_across_meshes(pair):
    o1, o8 = pair
    r1 = o1.run_iteration()
    r8 = o8.run_iteration()

    # E-step results are per-image: must match to float-accumulation noise
    for k in o1.par:
        a = o1._from_plane(o1.par[k])
        b = o8._from_plane(o8.par[k])
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4,
                                   err_msg=f"par[{k}]")

    # reductions (insert psum / stat psum) reorder sums across shards
    np.testing.assert_allclose(np.asarray(o1.refs), np.asarray(o8.refs),
                               rtol=1e-3, atol=1e-4 * float(
                                   np.abs(np.asarray(o1.refs)).max()))
    np.testing.assert_allclose(o1.fsc, o8.fsc, atol=2e-3)
    np.testing.assert_allclose(np.asarray(o1.sig), np.asarray(o8.sig),
                               rtol=1e-3)
    assert r1["res_shell"] == r8["res_shell"]
    assert r1["search_type"] == r8["search_type"]


def test_non_dividing_image_batch_consistent():
    """Pad rows from _chunked must contribute NOTHING to accumulating
    scans: with 10 images (5 slots/half on a 1-device mesh) and
    image_batch=2, each half has one pad row; weights/validity are
    zero-padded so sigma counts and the brick insert match a run whose
    chunk divides exactly (ADVICE r2, high)."""
    vol, imgs, cp = _dataset(seed=11)
    imgs = imgs[:10]
    cp = {k: v[:10] for k, v in cp.items()}

    def build(batch):
        para = Para(size=N, pixel_size=2.0, k=1, mask_radius=22.0, m_s=64,
                    m_l_r=8, m_l_t=4, m_l_d=4, m_reco=4, trans_s=1.5,
                    init_res=20.0, global_search_res=6.0, sym="C1",
                    save_ref_each_iter=False, save_thu_each_iter=False,
                    image_batch=batch, seed=3)
        o = Optimiser(para, mesh=make_mesh(n_devices=1))
        o.set_data(imgs, cp)
        o.init_reference(vol)
        o.init_sigma()
        return o

    oa, ob = build(2), build(5)  # 5 % 2 != 0 vs exact
    sa, sb = oa._residual_stats(), ob._residual_stats()
    assert sa[1].sum() == 10, sa[1]  # cnt counts only the valid images
    np.testing.assert_allclose(sa[0], sb[0], rtol=1e-5)
    np.testing.assert_allclose(sa[2], sb[2], rtol=1e-5)
    np.testing.assert_allclose(sa[3], sb[3], rtol=1e-5)
    oa.reconstruct()
    ob.reconstruct()
    # different image_batch => different slot-segment boundaries in the
    # host-segmented insert => float partial sums reorder (like the psum
    # reordering across mesh layouts above); values agree to
    # accumulation noise
    np.testing.assert_allclose(
        np.asarray(oa.refs), np.asarray(ob.refs), rtol=1e-3,
        atol=1e-4 * float(np.abs(np.asarray(ob.refs)).max()))


def test_bf16_tables_match_statistically_across_meshes():
    """The SHIPPED default (table_bf16=True) carries a STATISTICAL
    1-vs-8-device reproducibility contract, not a bitwise one: bf16
    quantization of the projection table can flip a borderline resampling
    draw whose tie psum ordering then breaks differently across layouts
    (config.py table_bf16 docs; VERDICT r3 weak #5). Posterior summaries
    and maps must still agree closely; individual draws may differ on a
    small fraction of images."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")
    vol, imgs, cp = _dataset(seed=5)

    def build(mesh):
        para = Para(size=N, pixel_size=2.0, k=1, mask_radius=22.0, m_s=128,
                    m_l_r=16, m_l_t=4, m_l_d=4, m_reco=4, trans_s=1.5,
                    init_res=20.0, global_search_res=6.0, sym="C1",
                    save_ref_each_iter=False, save_thu_each_iter=False,
                    image_batch=2, seed=3, table_bf16=True)
        o = Optimiser(para, mesh=mesh)
        o.set_data(imgs, cp)
        o.init_reference(vol)
        o.init_sigma()
        return o

    o1 = build(make_mesh(n_devices=1))
    o8 = build(make_mesh(n_devices=8))
    r1 = o1.run_iteration()
    r8 = o8.run_iteration()

    # rank-1 poses: identical for (almost) every image; allow one flip
    q1 = o1._from_plane(o1.par["topR"])
    q8 = o8._from_plane(o8.par["topR"])
    dots = np.abs(np.sum(q1 * q8, axis=-1))
    assert np.mean(dots > 0.999) >= (B - 1) / B, dots
    t1 = o1._from_plane(o1.par["topT"])
    t8 = o8._from_plane(o8.par["topT"])
    assert np.mean(np.linalg.norm(t1 - t8, axis=-1) < 0.25) >= (B - 1) / B

    # distribution-level summaries agree to loose tolerances
    for k in ("k1", "s0", "s1"):
        a = o1._from_plane(o1.par[k])
        b = o8._from_plane(o8.par[k])
        assert np.abs(np.mean(a) - np.mean(b)) < 0.2 * (np.mean(a) + 1e-3), k

    # maps: high correlation (not bitwise)
    ra = np.asarray(o1.refs).ravel()
    rb = np.asarray(o8.refs).ravel()
    corr = np.corrcoef(ra, rb)[0, 1]
    assert corr > 0.995, corr
    assert abs(r1["res_shell"] - r8["res_shell"]) <= 1


def test_second_iteration_still_consistent(pair):
    """The consistency must survive state round-trips (par scatter/gather,
    sigma update, reference averaging)."""
    o1, o8 = pair
    o1.run_iteration()
    o8.run_iteration()
    a = o1._from_plane(o1.par["topR"])
    b = o8._from_plane(o8.par["topR"])
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(o1.fsc, o8.fsc, atol=5e-3)
