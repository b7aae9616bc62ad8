"""Brick-packed gather/scatter vs the reference-equivalent element path:
the brick layout must be numerically identical to linear_gather /
double-sided linear_scatter_add (which are themselves adjoint-tested in
test_projector_reconstructor)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thunder_tpu.ops import brick
from thunder_tpu.ops.interp import linear_gather, linear_scatter_add
from thunder_tpu.core import projector, reconstructor
from thunder_tpu.geom import quat


def _cvol(rng, mc):
    return jnp.asarray(
        (rng.normal(size=(mc,) * 3) + 1j * rng.normal(size=(mc,) * 3)).astype(
            np.complex64))


def test_gather_matches_linear(rng):
    mc = 21
    vol = _cvol(rng, mc)
    tab = brick.pack_vol3(vol)
    coords = jnp.asarray(
        rng.uniform(-mc // 2 + 1, mc // 2 - 1.01, size=(500, 3)).astype(np.float32))
    a = brick.gather_vol3(tab, coords)
    b = linear_gather(vol, coords)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gather_out_of_band_zero(rng):
    mc = 15
    tab = brick.pack_vol3(_cvol(rng, mc))
    coords = jnp.asarray([[mc / 2 + 3.0, 0, 0], [0, -mc, 0]], jnp.float32)
    np.testing.assert_array_equal(np.asarray(brick.gather_vol3(tab, coords)), 0)


def test_insert_fold_matches_double_scatter(rng):
    mc = 21
    s = 700
    coords = jnp.asarray(
        rng.uniform(-mc // 2 + 1, mc // 2 - 1.01, size=(s, 3)).astype(np.float32))
    fv = jnp.asarray(
        (rng.normal(size=s) + 1j * rng.normal(size=s)).astype(np.complex64))
    tv = jnp.asarray((rng.normal(size=s) ** 2).astype(np.float32))

    tab = brick.insert3(brick.empty_insert3(mc), coords, fv, tv)
    f_new, t_new = brick.fold_insert3(tab)

    zf = jnp.zeros((mc,) * 3, jnp.complex64)
    zt = jnp.zeros((mc,) * 3, jnp.float32)
    f_old = linear_scatter_add(zf, coords, fv)
    f_old = linear_scatter_add(f_old, -coords, jnp.conj(fv))
    t_old = linear_scatter_add(zt, coords, tv)
    t_old = linear_scatter_add(t_old, -coords, tv)
    np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_old), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_new), np.asarray(t_old), atol=1e-4)


def test_insert_fold_2d(rng):
    mc = 21
    s = 300
    coords = jnp.asarray(
        rng.uniform(-mc // 2 + 1, mc // 2 - 1.01, size=(s, 2)).astype(np.float32))
    fv = jnp.asarray(
        (rng.normal(size=s) + 1j * rng.normal(size=s)).astype(np.complex64))
    tv = jnp.asarray((rng.normal(size=s) ** 2).astype(np.float32))
    tab = brick.insert2(brick.empty_insert2(mc), coords, fv, tv)
    f_new, t_new = brick.fold_insert2(tab)

    zf = jnp.zeros((mc,) * 2, jnp.complex64)
    zt = jnp.zeros((mc,) * 2, jnp.float32)
    f_old = linear_scatter_add(zf, coords, fv)
    f_old = linear_scatter_add(f_old, -coords, jnp.conj(fv))
    t_old = linear_scatter_add(zt, coords, tv)
    t_old = linear_scatter_add(t_old, -coords, tv)
    np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_old), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_new), np.asarray(t_old), atol=1e-4)


def test_gather_real3_channels(rng):
    mc = 17
    a = jnp.asarray(rng.normal(size=(mc,) * 3).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(mc,) * 3).astype(np.float32))
    tab = brick.pack_real3(a, b)
    coords = jnp.asarray(
        rng.uniform(-mc // 2 + 1, mc // 2 - 1.01, size=(200, 3)).astype(np.float32))
    out = brick.gather_real3(tab, coords)
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(linear_gather(a, coords)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out[:, 1]), np.asarray(linear_gather(b, coords)), atol=1e-5)


def test_brick_projector_matches_full(rng):
    """project_brick_3d == project_pixels_3d on the band interior."""
    n, pf, r = 24, 2, 8
    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    from thunder_tpu.ops.pixels import pixel_ring

    ring = pixel_ring(n, 1, r, bucket=64)
    col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
    q = quat.random_quat(jax.random.PRNGKey(0), 5)
    rots = quat.rotate3d(q)

    ft = projector.build_projectee_3d(vol, pf=pf)
    ref = projector.project_pixels_3d(ft, rots, col, row, pf=pf)
    tab = projector.build_brick_projectee_3d(vol, r, pf=pf)
    got = projector.project_brick_3d(tab, rots, col, row, pf=pf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_reconstruct_cropped_roundtrip(rng):
    """project -> brick insert -> reconstruct_cropped recovers the volume in
    the passband (the thunder_project/thunder_reconstruct oracle on the new
    path, appsrc/thunder_reconstruct.cpp:69-135)."""
    from thunder_tpu.ops.pixels import pixel_ring
    from thunder_tpu.ops.fft import fft3_center
    from thunder_tpu.ops.mask import soft_mask_shape
    from thunder_tpu.ops.spectrum import frc_fsc

    n, pf = 32, 2
    r = n // 2 - 2
    # smooth phantom
    g = np.arange(n) - n // 2
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    vol = np.exp(-((xx - 3) ** 2 + yy**2 + zz**2) / 18.0) + 0.7 * np.exp(
        -((xx + 4) ** 2 + (yy - 3) ** 2 + (zz + 2) ** 2) / 8.0)
    vol = jnp.asarray(vol.astype(np.float32))

    ring = pixel_ring(n, 0, r, bucket=256)
    col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
    pmask = jnp.asarray(ring.mask)
    b = 600
    q = quat.random_quat(jax.random.PRNGKey(1), b)
    rots = quat.rotate3d(q)
    tab = projector.build_brick_projectee_3d(vol, r, pf=pf)
    slices = projector.project_brick_3d(tab, rots, col, row, pf=pf)

    state = reconstructor.empty_brick_state(n, r, pf=pf)
    ctf = jnp.ones_like(slices, dtype=jnp.float32)
    state = reconstructor.insert_brick_3d(
        state, slices, ctf, rots, col, row, jnp.ones((b,), jnp.float32),
        pf=pf, pixel_mask=pmask)
    f_c, t_c = reconstructor.finalize_brick(state)
    out = reconstructor.reconstruct_cropped(
        f_c, t_c, jnp.ones((n // 2,)), n, pf=pf, max_radius=r)

    # the phantom's spectrum decays exponentially, so trilinear gridding
    # leakage dominates the top shells (same falloff as the uncropped path,
    # see test_projector_reconstructor's oracle thresholds)
    fsc = np.asarray(frc_fsc(fft3_center(out), fft3_center(vol), n // 2, 3))
    assert (fsc[1:9] > 0.9).all(), fsc

    # and the cropped pipeline must agree with the full-grid pipeline bitwise
    # up to float tolerance on the SAME accumulators
    f_full = brick.embed_center_ft(f_c, n * pf)
    t_full = brick.embed_center_ft(t_c, n * pf)
    out_full = reconstructor.reconstruct(
        f_full, t_full, jnp.ones((n // 2,)), n, pf=pf, max_radius=r)
    corr = float(jnp.vdot(out, out_full).real
                 / (jnp.linalg.norm(out) * jnp.linalg.norm(out_full)))
    assert corr > 0.9999, corr


def test_mkb_insert_roundtrip(rng):
    """MKB gridding-kernel insertion (config mkb_kernel, the reference's
    RECONSTRUCTOR_MKB_KERNEL branch, src/Reconstructor.cpp:452-556):
    project -> MKB insert -> reconstruct_cropped(insert_kernel="mkb")
    recovers the volume in the passband like the trilinear path."""
    from thunder_tpu.ops.pixels import pixel_ring
    from thunder_tpu.ops.fft import fft3_center
    from thunder_tpu.ops.spectrum import frc_fsc

    n, pf = 32, 2
    r = n // 2 - 2
    g = np.arange(n) - n // 2
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    vol = np.exp(-((xx - 3) ** 2 + yy**2 + zz**2) / 18.0) + 0.7 * np.exp(
        -((xx + 4) ** 2 + (yy - 3) ** 2 + (zz + 2) ** 2) / 8.0)
    vol = jnp.asarray(vol.astype(np.float32))

    ring = pixel_ring(n, 0, r, bucket=256)
    col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
    pmask = jnp.asarray(ring.mask)
    b = 600
    q = quat.random_quat(jax.random.PRNGKey(1), b)
    rots = quat.rotate3d(q)
    tab = projector.build_brick_projectee_3d(vol, r, pf=pf)
    slices = projector.project_brick_3d(tab, rots, col, row, pf=pf)

    from thunder_tpu.core.projector import slice_coords_3d

    coords = slice_coords_3d(rots, col, row, pf=pf)
    mc = brick.crop_size(r, pf)
    acc = brick.empty_insert3(mc)
    wv = jnp.broadcast_to(pmask[None, :], slices.shape).astype(jnp.float32)
    acc = brick.insert3_mkb(acc, coords, slices * wv, wv)
    f_c, t_c = brick.fold_insert3(acc)
    out = reconstructor.reconstruct_cropped(
        f_c, t_c, jnp.ones((n // 2,)), n, pf=pf, max_radius=r,
        insert_kernel="mkb")

    fsc = np.asarray(frc_fsc(fft3_center(out), fft3_center(vol), n // 2, 3))
    assert (fsc[1:9] > 0.9).all(), fsc

    # the blob support really is wider: samples land on voxels the
    # trilinear insert never touches
    acc_tri = brick.insert3(brick.empty_insert3(mc), coords,
                            slices * wv, wv)
    f_tri, t_tri = brick.fold_insert3(acc_tri)
    assert float(jnp.sum((jnp.abs(t_c) > 0) & (t_tri == 0))) > 0
