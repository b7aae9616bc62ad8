"""Shell statistics: power spectra, FRC/FSC, resolution conversion,
random-phase correction, B-factor estimation.

Matches src/Functions/Spectrum.cpp: shell index = round(|f|) (Spectrum.cpp
powerSpectrum:160-220, FSC:302-340), resolution conversions resP2A/resA2P,
randomPhase (:365-383), bFactorEst Guinier fit (:414-440).

The reference sums over the FFTW half spectrum; here shell sums run over the
full centered spectrum — every (conjugate) pair contributes twice to both
numerator and denominator, so all ratios (FSC, shell means) are identical.
All functions operate on CENTERED spectra (see ops.fft).
"""

import jax
import jax.numpy as jnp

from .fft import radius_grid_2d, radius_grid_3d


def _shell_index(n, spatial_dims):
    r = radius_grid_2d(n) if spatial_dims == 2 else radius_grid_3d(n)
    return jnp.rint(r).astype(jnp.int32)


def shell_sum(x, n_shells, spatial_dims):
    """Sum a real array over shells of its centered spectrum layout.
    x: (..., n, n[, n]); returns (..., n_shells)."""
    n = x.shape[-1]
    u = _shell_index(n, spatial_dims)
    flat = x.reshape(x.shape[: -spatial_dims] + (-1,))
    seg = u.reshape(-1)
    oob = seg >= n_shells
    seg = jnp.where(oob, n_shells, seg)
    out = jnp.zeros(flat.shape[:-1] + (n_shells + 1,), dtype=x.dtype)
    out = out.at[..., seg].add(flat)
    return out[..., :n_shells]


def shell_count(n, n_shells, spatial_dims, dtype=jnp.float32):
    ones = jnp.ones((n,) * spatial_dims, dtype=dtype)
    return shell_sum(ones, n_shells, spatial_dims)


def shell_average(x, n_shells, spatial_dims):
    s = shell_sum(x, n_shells, spatial_dims)
    c = shell_count(x.shape[-1], n_shells, spatial_dims, dtype=s.dtype)
    return s / jnp.maximum(c, 1.0)


def power_spectrum(ft, n_shells, spatial_dims):
    """Mean |F|^2 per shell (Spectrum.cpp:160-220)."""
    return shell_average(jnp.abs(ft) ** 2, n_shells, spatial_dims)


def frc_fsc(a, b, n_shells, spatial_dims):
    """Fourier ring/shell correlation between two centered spectra
    (Spectrum.cpp:222-340). Returns (..., n_shells)."""
    num = shell_sum((a * jnp.conj(b)).real, n_shells, spatial_dims)
    pa = shell_sum(jnp.abs(a) ** 2, n_shells, spatial_dims)
    pb = shell_sum(jnp.abs(b) ** 2, n_shells, spatial_dims)
    den = jnp.sqrt(pa * pb)
    return jnp.where(den == 0, 0.0, num / jnp.maximum(den, 1e-30))


def res_p2a(res_p, size, pixel_size):
    """Shell index -> resolution in angstroms (Spectrum.h resP2A)."""
    return size * pixel_size / jnp.maximum(res_p, 1e-30)


def res_a2p(res_a, size, pixel_size):
    return size * pixel_size / res_a


def res_p(fsc, thres, pf=1, r_low=1):
    """First shell (from r_low) where FSC drops below thres, minus one,
    divided by pf (Spectrum.cpp:343-365 resP, inverse=false).

    Host/np-friendly and jittable: uses argmax over a boolean scan."""
    n = fsc.shape[-1]
    idx = jnp.arange(n)
    below = (fsc < thres) & (idx >= r_low)
    any_below = jnp.any(below)
    first_below = jnp.argmax(below)
    result = jnp.where(any_below, first_below - 1, n - 1)
    return result // pf


def random_phase(key, ft, r, spatial_dims):
    """Randomize phases above shell r, keep below (Spectrum.cpp:365-383).

    Preserves Hermitian symmetry by generating the random phase field as the
    fft of a real field is NOT done here; instead we use a phase array that is
    antisymmetrized: phi(-k) = -phi(k), so the result stays the spectrum of a
    real map.
    """
    import jax

    n = ft.shape[-1]
    u = _shell_index(n, spatial_dims)
    phi = jax.random.uniform(key, ft.shape[-spatial_dims:], minval=0.0,
                             maxval=2 * jnp.pi, dtype=jnp.float32)
    # antisymmetrize: phi_a(k) = (phi(k) - phi(-k)) — centered flip is a
    # reversal along every spatial axis followed by a roll of 1 (even n)
    axes = tuple(range(-spatial_dims, 0))
    flip = phi
    for ax in axes:
        flip = jnp.flip(flip, axis=ax)
        flip = jnp.roll(flip, 1, axis=ax)
    phi = phi - flip
    # lax.complex instead of a 1j literal: eager complex scalars cannot be
    # transferred to the remote axon TPU backend
    phi = phi.astype(jnp.float32)
    rot = jax.lax.complex(jnp.cos(phi), jnp.sin(phi))
    return jnp.where(u > r, ft * rot, ft)


def b_factor_est(ft, size, r_high, r_low):
    """Guinier fit: slope of log(mean |F| per shell) vs (shell/size)^2,
    B = 2 * slope as used by bFactorFilter's exp(-0.5 B f^2)
    (Spectrum.cpp:414-440 + Filter.cpp:13-27).

    Returns the fitted B (negative for decaying spectra)."""
    spatial_dims = ft.ndim
    amp = shell_average(jnp.abs(ft), size // 2, spatial_dims)
    shells = jnp.arange(size // 2)
    sel = (shells >= r_low) & (shells < r_high)
    x = (shells.astype(jnp.float32) / size) ** 2
    y = jnp.log(jnp.maximum(amp, 1e-30))
    w = sel.astype(jnp.float32)
    sw = jnp.sum(w)
    mx = jnp.sum(w * x) / sw
    my = jnp.sum(w * y) / sw
    slope = jnp.sum(w * (x - mx) * (y - my)) / jnp.maximum(
        jnp.sum(w * (x - mx) ** 2), 1e-30
    )
    return 2 * slope
