"""Gridding kernels: Modified Kaiser-Bessel (MKB) blob and the trilinear /
nearest-neighbour grid-correction profiles.

Matches src/Functions/Functions.cpp with FUNCTIONS_MKB_ORDER_0 active
(include/Config.h:37):

- ``mkb_ft(r, a, alpha)``   = I0(alpha sqrt(1 - (r/a)^2)) / I0(alpha), r <= a
  (Functions.cpp:105-143) — the blob profile used when inserting into the
  padded Fourier volume.
- ``mkb_rl(r, a, alpha)``   = its 3D inverse Fourier transform
  (Functions.cpp:145-216): (2 pi)^{3/2} a^3 / I0(alpha) * I_{3/2}(v)/v^{3/2}
  (J_{3/2} outside the main lobe), v = sqrt(|alpha^2 - (2 pi a r)^2|)
  — divides the real-space volume for grid correction.
- ``tik_rl(r)`` = sinc^2: IFT estimate of trilinear interpolation
  (Functions.cpp:236-239); ``nik_rl`` = sinc for nearest neighbour.

I_{3/2} and J_{3/2} have closed forms used here:
  I_{3/2}(v) = sqrt(2/(pi v)) (cosh v / v ... ) — precisely
  I_{3/2}(v) = sqrt(2/(pi v)) * (cosh(v) - sinh(v)/v)
  J_{3/2}(v) = sqrt(2/(pi v)) * (sin(v)/v - cos(v))
"""

import jax.numpy as jnp

from ..geom.directional import _bessel_i0 as bessel_i0


def mkb_ft(r, a, alpha):
    """MKB blob profile (order 0). Zero outside r > a."""
    u2 = jnp.clip((r / a) ** 2, 0.0, None)
    val = bessel_i0(alpha * jnp.sqrt(jnp.maximum(1 - u2, 0.0))) / bessel_i0(
        jnp.asarray(alpha, dtype=jnp.result_type(r, jnp.float32))
    )
    return jnp.where(u2 > 1, 0.0, val)


def _bessel_i_3_2(v):
    v = jnp.maximum(v, 1e-6)
    return jnp.sqrt(2 / (jnp.pi * v)) * (jnp.cosh(v) - jnp.sinh(v) / v)


def _bessel_j_3_2(v):
    v = jnp.maximum(v, 1e-6)
    return jnp.sqrt(2 / (jnp.pi * v)) * (jnp.sin(v) / v - jnp.cos(v))


def mkb_rl(r, a, alpha):
    """3D inverse FT of the MKB blob (order 0), for grid correction."""
    alpha = jnp.asarray(alpha, dtype=jnp.result_type(r, jnp.float32))
    u = 2 * jnp.pi * a * r
    inside = u <= alpha
    v = jnp.sqrt(jnp.abs(alpha**2 - u**2))
    w = (2 * jnp.pi) ** 1.5 * a**3 / bessel_i0(alpha) / jnp.maximum(v, 1e-6) ** 1.5
    return jnp.where(inside, w * _bessel_i_3_2(v), w * _bessel_j_3_2(v))


def _sinc(x):
    safe = jnp.where(jnp.abs(x) < 1e-6, 1.0, x)
    return jnp.where(jnp.abs(x) < 1e-6, 1.0 - x * x / 6.0, jnp.sin(safe) / safe)


def tik_rl(r):
    """sinc^2 — grid-correction profile for the trilinear kernel
    (Functions.cpp:236-239): j0(pi r)^2 with j0 = spherical bessel = sinc."""
    return _sinc(jnp.pi * r) ** 2


def nik_rl(r):
    """sinc — grid-correction for nearest-neighbour interpolation."""
    return _sinc(jnp.pi * r)


def mkb_blob_vol(a, alpha):
    """Volume of the 3D MKB blob (Functions.cpp:218-233, order 0):
    (2 pi / alpha)^{3/2} a^3 I_{3/2}(alpha) / I0(alpha)."""
    alpha = jnp.asarray(alpha, dtype=jnp.float32)
    return (
        (2 * jnp.pi / alpha) ** 1.5
        * a**3
        * _bessel_i_3_2(alpha)
        / bessel_i0(alpha)
    )
