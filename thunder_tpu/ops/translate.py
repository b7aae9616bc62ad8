"""Phase-ramp translations in Fourier space.

Matches src/Image/ImageFunctions.cpp:233-252: translating an image by
(tx, ty) pixels multiplies its spectrum by exp(-2 pi i (h tx + k ty) / N)
for signed frequency (h, k).
"""

import jax
import jax.numpy as jnp


def _cis(phase):
    """exp(i phase) without a complex literal: a complex scalar in an EAGER
    op is transferred to the device as a complex buffer, which some PJRT
    backends (the remote axon TPU tunnel) cannot do."""
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


def translation_phase(col, row, tx, ty, n):
    """Phase ramps for pixel lists.

    col/row: (P,) signed integer frequencies; tx/ty: (...,) shifts in pixels.
    Returns (..., P) complex64.
    """
    col = col.astype(jnp.float32)
    row = row.astype(jnp.float32)
    phase = (
        2 * jnp.pi / n
        * (col * jnp.asarray(tx)[..., None] + row * jnp.asarray(ty)[..., None])
    )
    return _cis(-phase.astype(jnp.float32))


def translate_ft(ft, tx, ty):
    """Translate centered spectra (..., n, n) by (tx, ty) pixels."""
    from .fft import freq_grid_2d

    n = ft.shape[-1]
    h, k = freq_grid_2d(n)
    phase = (
        2 * jnp.pi / n
        * (
            h.astype(jnp.float32) * jnp.asarray(tx)[..., None, None]
            + k.astype(jnp.float32) * jnp.asarray(ty)[..., None, None]
        )
    )
    return ft * _cis(-phase.astype(jnp.float32))


def translate_ft_3d(ft, tx, ty, tz):
    """Translate centered volume spectra (..., n, n, n) by (tx, ty, tz)
    voxels (VOL_TRANSFORM equivalent used by reference auto-recentring,
    src/Optimiser.cpp:7425)."""
    from .fft import freq_grid_3d

    n = ft.shape[-1]
    h, k, l = freq_grid_3d(n)
    phase = (
        2 * jnp.pi / n
        * (
            h.astype(jnp.float32) * jnp.asarray(tx)[..., None, None, None]
            + k.astype(jnp.float32) * jnp.asarray(ty)[..., None, None, None]
            + l.astype(jnp.float32) * jnp.asarray(tz)[..., None, None, None]
        )
    )
    return ft * _cis(-phase.astype(jnp.float32))
