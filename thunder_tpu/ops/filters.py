"""Fourier-space filters on centered spectra.

Matches src/Functions/Filter.cpp: bFactorFilter (:13-44, exp(-0.5 B f^2) with
f in cycles/pixel), lowPassFilter / highPassFilter cosine-edge (:46-135), and
fscWeightingFilter sqrt(2 FSC / (1 + FSC)) (include/Functions/Filter.h:109,
the Rosenthal-Henderson Cref weighting).
"""

import jax.numpy as jnp

from .fft import radius_grid_2d, radius_grid_3d


def _freq_norm(n, spatial_dims):
    """|f| in cycles per pixel (0..~0.707)."""
    r = radius_grid_2d(n) if spatial_dims == 2 else radius_grid_3d(n)
    return r / n


def b_factor_filter(ft, b_factor, spatial_dims):
    f2 = _freq_norm(ft.shape[-1], spatial_dims) ** 2
    return ft * jnp.exp(-0.5 * b_factor * f2)


def low_pass_filter(ft, thres, ew, spatial_dims):
    """Cosine-edged low-pass; thres/ew in cycles per pixel
    (Filter.cpp:46-93)."""
    f = _freq_norm(ft.shape[-1], spatial_dims)
    w = jnp.where(
        f < thres,
        1.0,
        jnp.where(
            f > thres + ew,
            0.0,
            jnp.cos((f - thres) * jnp.pi / ew) / 2 + 0.5,
        ),
    )
    return ft * w


def high_pass_filter(ft, thres, ew, spatial_dims):
    f = _freq_norm(ft.shape[-1], spatial_dims)
    w = jnp.where(
        f > thres,
        1.0,
        jnp.where(
            f < thres - ew,
            0.0,
            jnp.cos((thres - f) * jnp.pi / ew) / 2 + 0.5,
        ),
    )
    return ft * w


def fsc_weighting_filter(ft, fsc, spatial_dims):
    """Cref = sqrt(2 FSC / (1 + FSC)) per shell, clamped at FSC <= 0
    (include/Functions/Filter.h:109)."""
    from .spectrum import _shell_index

    n = ft.shape[-1]
    u = _shell_index(n, spatial_dims)
    fsc_c = jnp.clip(fsc, 0.0, 1.0 - 1e-6)
    cref = jnp.sqrt(2 * fsc_c / (1 + fsc_c))
    u_c = jnp.minimum(u, fsc.shape[-1] - 1)
    return ft * cref[u_c]
