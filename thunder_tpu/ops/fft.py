"""Centered FFT helpers.

The reference stores real space with wrapped signed indexing (object center at
array index N/2; include/Image/Volume.h:520-528 iRL) and Fourier space as an
FFTW half-spectrum. Here both spaces are explicitly CENTERED dense arrays:

- real space: object center at array index N//2 (same as MRC files on disk),
- Fourier space: DC at array index N//2 along every axis; the signed
  frequency h in [-N/2, N/2) lives at array index h + N//2.

``fft2_center`` = fftshift . fftn . ifftshift, so a real-space shift of the
object produces the plain phase ramp exp(-2 pi i (h tx + k ty) / N) in the
centered spectrum — the convention every other module (CTF, translate,
projector) relies on.

Inverses normalize by 1/N^d (like FFTW backward + the reference's SCALE_FT
normalization in src/FFT.cpp:61-234, which jnp.fft.ifftn does natively).
"""

import jax.numpy as jnp


def fft2_center(x):
    """Centered 2D FFT over the last two axes."""
    return jnp.fft.fftshift(
        jnp.fft.fftn(jnp.fft.ifftshift(x, axes=(-2, -1)), axes=(-2, -1)),
        axes=(-2, -1),
    )


def ifft2_center(x):
    return jnp.fft.fftshift(
        jnp.fft.ifftn(jnp.fft.ifftshift(x, axes=(-2, -1)), axes=(-2, -1)),
        axes=(-2, -1),
    )


def fft3_center(x):
    axes = (-3, -2, -1)
    return jnp.fft.fftshift(
        jnp.fft.fftn(jnp.fft.ifftshift(x, axes=axes), axes=axes), axes=axes
    )


def ifft3_center(x):
    axes = (-3, -2, -1)
    return jnp.fft.fftshift(
        jnp.fft.ifftn(jnp.fft.ifftshift(x, axes=axes), axes=axes), axes=axes
    )


def freq_grid_2d(n):
    """Signed integer frequency grids (h, k) for an n x n centered spectrum,
    indexed [row, col] = [k, h]: returns (col_freq, row_freq) each (n, n)."""
    f = jnp.arange(n) - n // 2
    row = f[:, None] * jnp.ones((1, n), dtype=f.dtype)
    col = jnp.ones((n, 1), dtype=f.dtype) * f[None, :]
    return col, row


def freq_grid_3d(n):
    f = jnp.arange(n) - n // 2
    z = f[:, None, None] * jnp.ones((1, n, n), dtype=f.dtype)
    y = f[None, :, None] * jnp.ones((n, 1, n), dtype=f.dtype)
    x = f[None, None, :] * jnp.ones((n, n, 1), dtype=f.dtype)
    return x, y, z


def radius_grid_2d(n):
    x, y = freq_grid_2d(n)
    return jnp.sqrt((x.astype(jnp.float32)) ** 2 + (y.astype(jnp.float32)) ** 2)


def radius_grid_3d(n):
    x, y, z = freq_grid_3d(n)
    return jnp.sqrt(
        x.astype(jnp.float32) ** 2
        + y.astype(jnp.float32) ** 2
        + z.astype(jnp.float32) ** 2
    )


def pad_ft_center(ft, pad, spatial_dims):
    """Zero-pad a centered n^d spectrum to (pad*n)^d (Fourier interpolation;
    the reference's PAD_SIZE = _pf * _size, include/Reconstructor.h:57).

    ``spatial_dims``: number of trailing spatial axes (2 or 3). Non-spatial
    leading axes are untouched."""
    if pad == 1:
        return ft
    n = ft.shape[-1]
    m = n * pad
    lo = m // 2 - n // 2
    widths = [(0, 0)] * (ft.ndim - spatial_dims) + [(lo, m - n - lo)] * spatial_dims
    return jnp.pad(ft, widths)


def crop_ft_center(ft, out_n, spatial_dims):
    """Crop a centered spectrum down to out_n per spatial axis (inverse of
    pad_ft_center up to band limit)."""
    n = ft.shape[-1]
    if out_n == n:
        return ft
    lo = n // 2 - out_n // 2
    idx = [slice(None)] * (ft.ndim - spatial_dims) + [
        slice(lo, lo + out_n)
    ] * spatial_dims
    return ft[tuple(idx)]
