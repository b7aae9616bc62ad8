"""Fourier-slice projection.

TPU-native equivalent of the reference Projector (include/Projector.h:242-378,
src/Projector.cpp:97-356) and of the CUDA texture-projection kernels
(gpu/src/Kernel.cu:625-786):

- ``build_projectee_3d``: zero-pad the real-space reference volume by the
  padding factor pf, divide by the interpolation kernel's real-space taper
  (grid correction, src/Projector.cpp:gridCorrection, TIK_RL for trilinear),
  and FFT — giving the padded centered spectrum slices are drawn from.
- ``project_pixels_3d``: for each rotation R and ring pixel (i, j), gather
  the spectrum at R @ (i*pf, j*pf, 0) with trilinear interpolation
  (src/Projector.cpp:222-260). One batched XLA gather replaces the texture
  fetch + per-thread loops.

All outputs are in the IMAGE frequency convention (cycles per N-box), so a
projection can be compared directly against observed image spectra.
"""

import jax.numpy as jnp

from ..ops import brick
from ..ops.fft import fft2_center, fft3_center
from ..ops.interp import linear_gather, nearest_gather
from ..ops.kernels import tik_rl, nik_rl


def _pad_rl(vol, pf, dims=None):
    """Zero-pad the last ``dims`` spatial axes to pf x size per axis,
    keeping the object center at (pf n)//2 (VOL_PAD_RL semantics). Leading
    batch/class axes are untouched."""
    dims = vol.ndim if dims is None else dims
    n = vol.shape[-1]
    m = n * pf
    lo = m // 2 - n // 2
    widths = [(0, 0)] * (vol.ndim - dims) + [(lo, m - n - lo)] * dims
    return jnp.pad(vol, widths)


def _grid_correct_rl(vol, pf, interp="linear", dims=None):
    dims = vol.ndim if dims is None else dims
    n_pad = vol.shape[-1]
    grids = []
    for ax in range(dims):
        f = jnp.arange(n_pad, dtype=jnp.float32) - n_pad // 2
        s = [1] * dims
        s[ax] = n_pad
        grids.append(f.reshape(s))
    r = jnp.sqrt(sum(g**2 for g in grids)) / n_pad
    prof = tik_rl(r) if interp == "linear" else nik_rl(r)
    return vol / prof


def build_projectee_3d(vol_rl, pf=2, interp="linear", grid_correct=True):
    """Real-space volume (..., n, n, n) -> padded centered spectrum
    (..., pf n, pf n, pf n)."""
    padded = _pad_rl(vol_rl, pf, dims=3)
    if grid_correct:
        padded = _grid_correct_rl(padded, pf, interp, dims=3)
    return fft3_center(padded)


def build_projectee_2d(img_rl, pf=2, interp="linear", grid_correct=True):
    padded = _pad_rl(img_rl, pf, dims=2)
    if grid_correct:
        padded = _grid_correct_rl(padded, pf, interp, dims=2)
    return fft2_center(padded)


def project_pixels_3d(vol_ft, rot, col, row, pf=2, interp="linear"):
    """Central-slice projection at ring pixels.

    vol_ft: (m, m, m) padded centered spectrum (m = pf * n)
    rot:    (..., 3, 3) rotation matrices
    col/row: (P,) signed integer image frequencies
    Returns (..., P) complex64 slice values.
    """
    plane = jnp.stack(
        [col.astype(jnp.float32) * pf, row.astype(jnp.float32) * pf,
         jnp.zeros_like(col, dtype=jnp.float32)],
        axis=-1,
    )  # (P, 3)
    coords = jnp.einsum("...ij,pj->...pi", rot.astype(jnp.float32), plane)
    # volume axis order is [z, y, x]; coords are (x, y, z)
    coords = coords[..., ::-1]
    if interp == "linear":
        return linear_gather(vol_ft, coords)
    return nearest_gather(vol_ft, coords)


def project_pixels_2d(img_ft, rot, col, row, pf=2, interp="linear"):
    """2D in-plane projection: gather rotated ring pixels from a padded
    centered 2D spectrum. rot: (..., 2, 2)."""
    plane = jnp.stack(
        [col.astype(jnp.float32) * pf, row.astype(jnp.float32) * pf], axis=-1
    )
    coords = jnp.einsum("...ij,pj->...pi", rot.astype(jnp.float32), plane)
    coords = coords[..., ::-1]  # (row, col) array order
    if interp == "linear":
        return linear_gather(img_ft, coords)
    return nearest_gather(img_ft, coords)


def build_brick_projectee_3d(vol_rl, r_max, pf=2, interp="linear",
                             grid_correct=True, dtype=jnp.float32,
                             half=False):
    """Real-space volume (n, n, n) -> band-cropped brick gather table
    (mc, mc, mc, 16). ``r_max`` is the highest image shell the E-step will
    touch (the ladder's r); the table only stores |k| <= r_max * pf, which
    keeps it small through most of the frequency ladder (ops.brick).
    ``dtype=bfloat16`` halves gather cost on TPU (see brick.pack_vol3);
    ``half=True`` stores the Hermitian half-space only (z >= 0,
    brick.pack_vol3_half) — exact for real volumes, half the memory, and
    the faster v5e gather regime for bands up to mc = 196."""
    ft = build_projectee_3d(vol_rl, pf=pf, interp=interp,
                            grid_correct=grid_correct)
    mc = brick.crop_size(r_max, pf)
    pack = brick.pack_vol3_half if half else brick.pack_vol3
    return pack(brick.crop_center_ft(ft, mc), dtype=dtype)


def build_brick_projectee_2d(img_rl, r_max, pf=2, interp="linear",
                             grid_correct=True, dtype=jnp.float32):
    """2D counterpart -> (mc, mc, 8) bilinear brick table. Leading class
    axes are allowed: (..., n, n) -> (..., mc, mc, 8)."""
    ft = build_projectee_2d(img_rl, pf=pf, interp=interp,
                            grid_correct=grid_correct)
    mc = brick.crop_size(r_max, pf)
    m = ft.shape[-1]
    lo = m // 2 - mc // 2
    ft = ft[..., lo:lo + mc, lo:lo + mc]
    return brick.pack_vol2(ft, dtype=dtype)


def slice_coords_3d(rot, col, row, pf=2):
    """Rotated central-slice coordinates in array (z, y, x) order.

    rot: (..., 3, 3); col/row: (P,) signed integer image frequencies.
    Returns (..., P, 3) float32."""
    plane = jnp.stack(
        [col.astype(jnp.float32) * pf, row.astype(jnp.float32) * pf,
         jnp.zeros_like(col, dtype=jnp.float32)],
        axis=-1,
    )
    coords = jnp.einsum("...ij,pj->...pi", rot.astype(jnp.float32), plane)
    return coords[..., ::-1]


def slice_coords_2d(rot, col, row, pf=2):
    plane = jnp.stack(
        [col.astype(jnp.float32) * pf, row.astype(jnp.float32) * pf], axis=-1
    )
    coords = jnp.einsum("...ij,pj->...pi", rot.astype(jnp.float32), plane)
    return coords[..., ::-1]


def project_brick_3d(tab, rot, col, row, pf=2):
    """Central-slice projection via the brick table: one width-16 row fetch
    per sample (the TPU replacement for the CUDA texture fetch,
    gpu/src/Kernel.cu:625-786). Half-space tables (pack_vol3_half, z axis
    shorter than y/x) gather with the conjugate-mirror fetch."""
    coords = slice_coords_3d(rot, col, row, pf=pf)
    if tab.shape[0] != tab.shape[1]:
        return brick.gather_vol3_half(tab, coords)
    return brick.gather_vol3(tab, coords)


def project_brick_2d(tab, rot, col, row, pf=2):
    return brick.gather_vol2(tab, slice_coords_2d(rot, col, row, pf=pf))


def project_full_3d(vol_ft, rot, n, max_radius, pf=2):
    """Project onto a full centered n x n image spectrum (utility/tools path,
    src/Projector.cpp:project(Image&, ...)). Pixels beyond ``max_radius``
    are zero."""
    f = jnp.arange(n, dtype=jnp.float32) - n // 2
    colg = jnp.broadcast_to(f[None, :], (n, n))
    rowg = jnp.broadcast_to(f[:, None], (n, n))
    vals = project_pixels_3d(
        vol_ft, rot, colg.reshape(-1), rowg.reshape(-1), pf
    )
    vals = vals.reshape(rot.shape[:-2] + (n, n))
    r2 = colg**2 + rowg**2
    return jnp.where(r2 < float(max_radius) ** 2, vals, 0.0)
