"""Brick-packed spectral volumes — the TPU gather/scatter kernel layout.

The hot paths of the reference are a texture-interpolated central-slice
gather (gpu/src/Kernel.cu:625-786 kernel_Project3D) and an atomicAdd
trilinear gridding scatter (gpu/src/Kernel.cu:2276-3126 kernel_InsertF/T).
TPUs have neither texture units nor atomics, and XLA's gather/scatter cost
is dominated by a fixed per-INDEX cost (~10 ns) that is almost independent
of how many contiguous bytes each index moves (measured on v5e). The
TPU-native layout is therefore:

- crop the padded centered spectrum to the active frequency band
  (|k| <= r_max * pf), since the ladder keeps r far below Nyquist for most
  of a run, and
- pack every 2x2x2 interpolation neighbourhood ("brick") into ONE row of a
  flat table, so a trilinear complex gather is a single width-16 row fetch
  ([re x 8, im x 8]) + an 8-wide dot, and a gridding insert is a single
  width-24 row scatter-add ([F.re x 8, F.im x 8, T x 8]).

The Hermitian mirror of the insert (the reference scatters value at +k and
conj(value) at -k, src/Reconstructor.cpp:569-928) is deferred: scatter only
at +k, and after folding bricks back to voxels apply
    F <- F + conj(reflect(F)),  T <- T + reflect(T)
which is identical by linearity and halves the scatter count. Crop sizes are
odd so reflect() is a pure axis flip.

Coordinates are SIGNED centered units in array order (z, y, x) for 3D /
(y, x) for 2D, like ops.interp; voxel index = coord + mc//2. Out-of-band
samples gather 0 / scatter nowhere.
"""

from functools import partial

import jax
import jax.numpy as jnp


def crop_half(r_max, pf):
    """Crop half-width: covers |k| <= r_max*pf with a +2 margin for the
    trilinear corner and the gridding kernel's convolution support."""
    return int(r_max) * pf + 2


def crop_size(r_max, pf):
    return 2 * crop_half(r_max, pf) + 1  # odd


def crop_center_ft(ft_full, mc):
    """Center-crop a centered spectrum (m,)*d -> (mc,)*d."""
    m = ft_full.shape[-1]
    lo = m // 2 - mc // 2
    d = ft_full.ndim
    sl = (Ellipsis,) + tuple(slice(lo, lo + mc) for _ in range(d if d <= 3 else 3))
    # only crop trailing spatial dims equal to ndim of spectrum
    sl = tuple(slice(lo, lo + mc) for _ in range(ft_full.ndim))
    return ft_full[sl]


def embed_center_ft(ft_crop, m):
    """Zero-embed a centered cropped spectrum (mc,)*d back into (m,)*d."""
    mc = ft_crop.shape[-1]
    lo = m // 2 - mc // 2
    widths = [(lo, m - mc - lo)] * ft_crop.ndim
    return jnp.pad(ft_crop, widths)


# --------------------------------------------------------------------- 3D

def _corners3(coords, mc):
    """coords (..., 3) centered (z, y, x) -> (flat brick idx, w8, valid)."""
    base = jnp.floor(coords)
    frac = (coords - base).astype(jnp.float32)
    bi = base.astype(jnp.int32) + mc // 2
    idx = (bi[..., 0] * mc + bi[..., 1]) * mc + bi[..., 2]
    valid = jnp.all((bi >= 0) & (bi < mc - 1), axis=-1)
    fz, fy, fx = frac[..., 0], frac[..., 1], frac[..., 2]
    wz = jnp.stack([1 - fz, fz], -1)
    wy = jnp.stack([1 - fy, fy], -1)
    wx = jnp.stack([1 - fx, fx], -1)
    w8 = (wz[..., :, None, None] * wy[..., None, :, None]
          * wx[..., None, None, :]).reshape(coords.shape[:-1] + (8,))
    return idx, w8, valid


def pack_vol3(vol_ft, dtype=jnp.float32):
    """Centered cropped complex spectrum (mc, mc, mc) -> gather table.

    ``dtype=float32``: (mc, mc, mc, 16) rows [re(corner 0..7),
    im(corner 0..7)], corner order (dz, dy, dx) binary.

    ``dtype=bfloat16``: (mc, mc, mc, 8) float32 rows where each LANE packs
    one corner's (re, im) as a bitcast bf16 pair. Measured XLA gather cost
    on v5e follows the LANE count, not bytes (~6.7 ns/idx at 2-8 lanes,
    ~28 ns at 16, scripts/gather_width_bench.py + in-situ probes), so
    halving lanes nearly halves the E-step's dominant op; gathers unpack
    and accumulate the interpolation dot in float32."""
    mc = vol_ft.shape[0]
    vp = jnp.pad(vol_ft, ((0, 1), (0, 1), (0, 1)))
    parts = [vp[dz:dz + mc, dy:dy + mc, dx:dx + mc]
             for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    st = jnp.stack(parts, -1)  # (mc, mc, mc, 8) complex
    if dtype == jnp.bfloat16:
        pairs = jnp.stack(
            [st.real.astype(jnp.bfloat16), st.imag.astype(jnp.bfloat16)],
            -1)  # (mc, mc, mc, 8, 2) bf16
        return jax.lax.bitcast_convert_type(pairs, jnp.float32)
    return jnp.concatenate(
        [st.real.astype(dtype), st.imag.astype(dtype)], -1)


def unpack_pair_rows(rows):
    """(..., C) f32 bitcast-packed rows -> (re (..., C), im (..., C)) f32
    (see pack_vol3 bfloat16 layout)."""
    pairs = jax.lax.bitcast_convert_type(rows, jnp.bfloat16)  # (..., C, 2)
    return (pairs[..., 0].astype(jnp.float32),
            pairs[..., 1].astype(jnp.float32))


def gather_vol3(tab, coords):
    """Trilinear complex gather: ONE row-take per sample.

    tab: (mc, mc, mc, 16) f32 or (mc, mc, mc, 8) packed-bf16-pair f32
    (pack_vol3); coords: (..., 3) centered (z, y, x).
    Returns (...,) complex64."""
    mc = tab.shape[0]
    n_chan = tab.shape[-1]
    idx, w8, valid = _corners3(coords, mc)
    idx = jnp.where(valid, idx, 0)
    rows = jnp.take(tab.reshape(mc**3, n_chan), idx.reshape(-1), axis=0)
    rows = rows.reshape(idx.shape + (n_chan,))
    if n_chan == 8:  # packed bf16 pairs, one lane per corner
        rr, ri = unpack_pair_rows(rows)
    else:
        rows = rows.astype(jnp.float32)
        rr, ri = rows[..., :8], rows[..., 8:]
    re = jnp.sum(rr * w8, -1)
    im = jnp.sum(ri * w8, -1)
    return jnp.where(valid, jax.lax.complex(re, im), 0.0)


def half_rows(mc):
    """z-rows of a Hermitian half-space table (centered z in [0, mc//2])."""
    return mc // 2 + 1


def pack_vol3_half(vol_ft, dtype=jnp.float32):
    """Hermitian half-space gather table: pack_vol3 bricks at centered
    z >= 0 only ((mc//2 + 1, mc, mc, C)).

    For the spectrum of a REAL volume F(-k) = conj(F(k)), so samples with
    z < 0 can fetch at -k and conjugate (gather_vol3_half) — the reference
    projector's own conjugate-mirror fetch (src/Projector.cpp:222-356,
    MESH_FOR... half-spectrum convention). This halves the table, which on
    v5e moves the dominant E-step gather from the ~14.8 ns/idx regime
    (tables >= 4M rows) to the ~5.15 ns/idx regime (< 4M rows) for every
    band up to mc = 196 (scripts/gather_size_probe.py)."""
    mc = vol_ft.shape[0]
    return pack_vol3(vol_ft, dtype=dtype)[mc // 2:]


def _corners3_half(coords, mc):
    """Mirror-to-upper-half trilinear corners.

    Returns (idx, w8, valid, sgn): idx into the flat (half_rows(mc)*mc*mc)
    half table, sgn = -1 where the sample was mirrored (imag conjugation).
    Matches _corners3's validity for all in-band samples (|coord| <=
    mc//2 - 2, the crop margin guarantees this); only exact-integer
    samples AT the crop boundary |z| == mc//2 differ, which the +2 crop
    margin keeps out of reach."""
    sgn = jnp.where(coords[..., 0] < 0, -1.0, 1.0).astype(jnp.float32)
    cm = coords * sgn[..., None]
    base = jnp.floor(cm)
    frac = (cm - base).astype(jnp.float32)
    bi = base.astype(jnp.int32)
    bz = bi[..., 0]
    by = bi[..., 1] + mc // 2
    bx = bi[..., 2] + mc // 2
    idx = (bz * mc + by) * mc + bx
    valid = ((bz >= 0) & (bz < mc // 2)
             & (by >= 0) & (by < mc - 1)
             & (bx >= 0) & (bx < mc - 1))
    fz, fy, fx = frac[..., 0], frac[..., 1], frac[..., 2]
    wz = jnp.stack([1 - fz, fz], -1)
    wy = jnp.stack([1 - fy, fy], -1)
    wx = jnp.stack([1 - fx, fx], -1)
    w8 = (wz[..., :, None, None] * wy[..., None, :, None]
          * wx[..., None, None, :]).reshape(coords.shape[:-1] + (8,))
    return idx, w8, valid, sgn


def gather_vol3_half(tab, coords):
    """Trilinear complex gather from a pack_vol3_half table; same result
    as gather_vol3 on the full table when the packed volume is Hermitian
    (exactly Hermitian input -> bitwise-identical interpolation; FFT-of-
    real input -> equal up to the FFT's own f32 asymmetry ~1e-6)."""
    hz, mc = tab.shape[0], tab.shape[1]
    n_chan = tab.shape[-1]
    idx, w8, valid, sgn = _corners3_half(coords, mc)
    idx = jnp.where(valid, idx, 0)
    rows = jnp.take(tab.reshape(hz * mc * mc, n_chan), idx.reshape(-1),
                    axis=0)
    rows = rows.reshape(idx.shape + (n_chan,))
    if n_chan == 8:  # packed bf16 pairs, one lane per corner
        rr, ri = unpack_pair_rows(rows)
    else:
        rows = rows.astype(jnp.float32)
        rr, ri = rows[..., :8], rows[..., 8:]
    re = jnp.sum(rr * w8, -1)
    im = jnp.sum(ri * w8, -1) * sgn
    return jnp.where(valid, jax.lax.complex(re, im), 0.0)


def pack_real3(*vols):
    """Pack C real cropped volumes into a (mc, mc, mc, 8C) gather table."""
    mc = vols[0].shape[0]
    chans = []
    for v in vols:
        vp = jnp.pad(v, ((0, 1), (0, 1), (0, 1)))
        parts = [vp[dz:dz + mc, dy:dy + mc, dx:dx + mc]
                 for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
        chans.append(jnp.stack(parts, -1).astype(jnp.float32))
    return jnp.concatenate(chans, -1)


def gather_real3(tab, coords):
    """Trilinear gather of C packed real channels: returns (..., C)."""
    mc = tab.shape[0]
    c = tab.shape[-1] // 8
    idx, w8, valid = _corners3(coords, mc)
    idx = jnp.where(valid, idx, 0)
    rows = jnp.take(tab.reshape(mc**3, 8 * c), idx.reshape(-1), axis=0)
    rows = rows.reshape(idx.shape + (c, 8))
    out = jnp.sum(rows * w8[..., None, :], -1)
    return jnp.where(valid[..., None], out, 0.0)


def mkb_rows3(coords, mc, a=1.9, alpha=15.0):
    """MKB gridding-kernel insertion support, decomposed into brick rows.

    The reference's RECONSTRUCTOR_MKB_KERNEL option deposits each sample
    over the grid points within radius ``a`` (= 1.9 padded voxels) of the
    sample, weighted by the blob's Fourier profile MKB_FT
    (include/Config.h:95, src/Reconstructor.cpp:452-556). The 4^3 voxel
    neighbourhood [floor(u)-1, floor(u)+2] covers that support and tiles
    EXACTLY into 8 brick rows (rows at floor(u)-1 + {0,2}^3, each holding
    its 2^3 corners), so the MKB insert is 8 row-scatters of the same
    shape as the trilinear one.

    Returns a list of 8 (idx, w8, valid) tuples like _corners3 (invalid
    rows must be redirected to the drop slot by the caller)."""
    from . import kernels

    base = jnp.floor(coords)
    frac = (coords - base).astype(jnp.float32)
    b0 = base.astype(jnp.int32) + mc // 2 - 1  # neighbourhood start voxel
    out = []
    for dz in (0, 2):
        for dy in (0, 2):
            for dx in (0, 2):
                off = jnp.asarray([dz, dy, dx], jnp.int32)
                bi = b0 + off
                idx = (bi[..., 0] * mc + bi[..., 1]) * mc + bi[..., 2]
                valid = jnp.all((bi >= 0) & (bi < mc - 1), axis=-1)
                # corner c of this row sits at delta = off + c - 1 - frac
                w_c = []
                for cz in (0, 1):
                    for cy in (0, 1):
                        for cx in (0, 1):
                            d = jnp.stack([
                                dz + cz - 1.0 - frac[..., 0],
                                dy + cy - 1.0 - frac[..., 1],
                                dx + cx - 1.0 - frac[..., 2],
                            ], -1)
                            r = jnp.sqrt(jnp.sum(d * d, -1))
                            w_c.append(kernels.mkb_ft(r, a, alpha))
                w8 = jnp.stack(w_c, -1)
                out.append((idx, w8, valid))
    return out


def insert3_mkb(tab, coords, fv, tv, w=None, a=1.9, alpha=15.0):
    """MKB-kernel gridding insert: 8 width-24 row-adds per sample
    (src/Reconstructor.cpp:452-556 MKB branch). Same signature as
    :func:`insert3`."""
    mc = round((tab.shape[0] - 1) ** (1 / 3))
    for idx, w8, valid in mkb_rows3(coords, mc, a=a, alpha=alpha):
        idx = jnp.where(valid, idx, mc**3)
        if w is not None:
            w8 = w8 * w[..., None]
        contrib = jnp.concatenate(
            [fv.real[..., None] * w8, fv.imag[..., None] * w8,
             tv[..., None] * w8], -1)
        tab = tab.at[idx.reshape(-1)].add(contrib.reshape(-1, 24))
    return tab


def empty_insert3(mc):
    """Flat insert accumulator with a trailing drop row."""
    return jnp.zeros((mc**3 + 1, 24), jnp.float32)


def insert3(tab, coords, fv, tv, w=None):
    """Scatter pose-weighted pixels: ONE width-24 row-add per sample.

    tab: (mc^3+1, 24); coords (..., 3); fv (...,) complex; tv (...,) real;
    w: optional (...,) extra real weight folded into both F and T."""
    mc = round((tab.shape[0] - 1) ** (1 / 3))
    idx, w8, valid = _corners3(coords, mc)
    idx = jnp.where(valid, idx, mc**3)
    if w is not None:
        w8 = w8 * w[..., None]
    contrib = jnp.concatenate(
        [fv.real[..., None] * w8, fv.imag[..., None] * w8, tv[..., None] * w8],
        -1,
    )
    return tab.at[idx.reshape(-1)].add(contrib.reshape(-1, 24))


def fold_insert3_lane(tab_lane, mc, hermitian=True):
    """fold_insert3 for the LANE-MAJOR (24, R_pad) accumulator produced by
    ops.pallas_insert (rows beyond mc^3 are drop/pad rows). Returns
    (F (mc,mc,mc) complex64, T (mc,mc,mc) f32)."""
    bt = tab_lane[:, :mc**3].reshape(24, mc, mc, mc)
    fr = jnp.zeros((mc, mc, mc), jnp.float32)
    fi = jnp.zeros((mc, mc, mc), jnp.float32)
    tt = jnp.zeros((mc, mc, mc), jnp.float32)
    s = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ez = mc - dz if dz else mc
                ey = mc - dy if dy else mc
                ex = mc - dx if dx else mc
                blk = (slice(None, ez), slice(None, ey), slice(None, ex))
                tgt = (slice(dz, None), slice(dy, None), slice(dx, None))
                fr = fr.at[tgt].add(bt[s][blk])
                fi = fi.at[tgt].add(bt[8 + s][blk])
                tt = tt.at[tgt].add(bt[16 + s][blk])
                s += 1
    f = jax.lax.complex(fr, fi)
    if hermitian:
        f = f + jnp.conj(f[::-1, ::-1, ::-1])
        tt = tt + tt[::-1, ::-1, ::-1]
    return f, tt


def fold_insert3(tab, hermitian=True):
    """Fold the brick accumulator back to voxels and apply the deferred
    Hermitian mirror. Returns (F (mc,mc,mc) complex64, T (mc,mc,mc) f32)."""
    mc = round((tab.shape[0] - 1) ** (1 / 3))
    bt = tab[:-1].reshape(mc, mc, mc, 24)
    fr = jnp.zeros((mc, mc, mc), jnp.float32)
    fi = jnp.zeros((mc, mc, mc), jnp.float32)
    tt = jnp.zeros((mc, mc, mc), jnp.float32)
    s = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ez = mc - dz if dz else mc
                ey = mc - dy if dy else mc
                ex = mc - dx if dx else mc
                blk = bt[:ez, :ey, :ex]
                fr = fr.at[dz:, dy:, dx:].add(blk[..., s])
                fi = fi.at[dz:, dy:, dx:].add(blk[..., 8 + s])
                tt = tt.at[dz:, dy:, dx:].add(blk[..., 16 + s])
                s += 1
    f = jax.lax.complex(fr, fi)
    if hermitian:
        f = f + jnp.conj(f[::-1, ::-1, ::-1])
        tt = tt + tt[::-1, ::-1, ::-1]
    return f, tt


# --------------------------------------------------------------------- 2D

def _corners2(coords, mc):
    base = jnp.floor(coords)
    frac = (coords - base).astype(jnp.float32)
    bi = base.astype(jnp.int32) + mc // 2
    idx = bi[..., 0] * mc + bi[..., 1]
    valid = jnp.all((bi >= 0) & (bi < mc - 1), axis=-1)
    fy, fx = frac[..., 0], frac[..., 1]
    wy = jnp.stack([1 - fy, fy], -1)
    wx = jnp.stack([1 - fx, fx], -1)
    w4 = (wy[..., :, None] * wx[..., None, :]).reshape(coords.shape[:-1] + (4,))
    return idx, w4, valid


def pack_vol2(img_ft, dtype=jnp.float32):
    """2D counterpart of pack_vol3: (..., mc, mc, 8) f32 rows, or
    (..., mc, mc, 4) packed-bf16-pair f32 rows for ``dtype=bfloat16``."""
    mc = img_ft.shape[-1]
    vp = jnp.pad(img_ft, tuple([(0, 0)] * (img_ft.ndim - 2)) + ((0, 1), (0, 1)))
    parts = [vp[..., dy:dy + mc, dx:dx + mc] for dy in (0, 1) for dx in (0, 1)]
    st = jnp.stack(parts, -1)
    if dtype == jnp.bfloat16:
        pairs = jnp.stack(
            [st.real.astype(jnp.bfloat16), st.imag.astype(jnp.bfloat16)],
            -1)
        return jax.lax.bitcast_convert_type(pairs, jnp.float32)
    return jnp.concatenate(
        [st.real.astype(dtype), st.imag.astype(dtype)], -1)


def gather_vol2(tab, coords):
    """Bilinear complex gather from a (mc, mc, 8) f32 or (mc, mc, 4)
    packed-bf16-pair table; coords (..., 2) centered (y, x)."""
    mc = tab.shape[0]
    n_chan = tab.shape[-1]
    idx, w4, valid = _corners2(coords, mc)
    idx = jnp.where(valid, idx, 0)
    rows = jnp.take(tab.reshape(mc**2, n_chan), idx.reshape(-1), axis=0)
    rows = rows.reshape(idx.shape + (n_chan,))
    if n_chan == 4:  # packed bf16 pairs
        rr, ri = unpack_pair_rows(rows)
    else:
        rows = rows.astype(jnp.float32)
        rr, ri = rows[..., :4], rows[..., 4:]
    re = jnp.sum(rr * w4, -1)
    im = jnp.sum(ri * w4, -1)
    return jnp.where(valid, jax.lax.complex(re, im), 0.0)


def empty_insert2(mc):
    return jnp.zeros((mc**2 + 1, 12), jnp.float32)


def insert2(tab, coords, fv, tv, w=None):
    mc = round((tab.shape[0] - 1) ** 0.5)
    idx, w4, valid = _corners2(coords, mc)
    idx = jnp.where(valid, idx, mc**2)
    if w is not None:
        w4 = w4 * w[..., None]
    contrib = jnp.concatenate(
        [fv.real[..., None] * w4, fv.imag[..., None] * w4, tv[..., None] * w4],
        -1,
    )
    return tab.at[idx.reshape(-1)].add(contrib.reshape(-1, 12))


def fold_insert2(tab, hermitian=True):
    mc = round((tab.shape[0] - 1) ** 0.5)
    bt = tab[:-1].reshape(mc, mc, 12)
    fr = jnp.zeros((mc, mc), jnp.float32)
    fi = jnp.zeros((mc, mc), jnp.float32)
    tt = jnp.zeros((mc, mc), jnp.float32)
    s = 0
    for dy in (0, 1):
        for dx in (0, 1):
            ey = mc - dy if dy else mc
            ex = mc - dx if dx else mc
            blk = bt[:ey, :ex]
            fr = fr.at[dy:, dx:].add(blk[..., s])
            fi = fi.at[dy:, dx:].add(blk[..., 4 + s])
            tt = tt.at[dy:, dx:].add(blk[..., 8 + s])
            s += 1
    f = jax.lax.complex(fr, fi)
    if hermitian:
        f = f + jnp.conj(f[::-1, ::-1])
        tt = tt + tt[::-1, ::-1]
    return f, tt
