"""Contrast transfer function evaluation.

Matches the reference formulas exactly (src/CTF.cpp:11-113):

    lambda = 12.2643247 / sqrt(V (1 + V * 0.978466e-6))          [angstrom]
    w1 = sqrt(1 - ac^2); w2 = ac
    K1 = pi lambda; K2 = pi/2 Cs lambda^3
    defocus(angle) = -(dU + dV + (dU - dV) cos(2 (angle - theta))) / 2
    chi = K1 * defocus * u^2 + K2 * u^4 - phaseShift
    CTF = -w1 sin(chi) + w2 cos(chi)

where u is the spatial frequency in 1/angstrom and angle = atan2(k, h).
All functions are batched over leading dims of the CTF parameter arrays.
"""

import jax.numpy as jnp


def wavelength(voltage):
    """Electron wavelength in angstroms from voltage in volts."""
    return 12.2643247 / jnp.sqrt(voltage * (1 + voltage * 0.978466e-6))


def ctf_1d(f, voltage, defocus, cs, amp_contrast, phase_shift=0.0):
    """Radial CTF at frequency f (1/angstrom), no astigmatism
    (src/CTF.cpp:11-29)."""
    lam = wavelength(voltage)
    w1 = jnp.sqrt(1 - amp_contrast**2)
    w2 = amp_contrast
    k1 = jnp.pi * lam
    k2 = jnp.pi / 2 * cs * lam**3
    chi = k1 * defocus * f**2 + k2 * f**4 - phase_shift
    return -w1 * jnp.sin(chi) + w2 * jnp.cos(chi)


def ctf_pixels(col_freq, row_freq, n, pixel_size, voltage, defocus_u, defocus_v,
               defocus_theta, cs, amp_contrast, phase_shift, defocus_factor=1.0):
    """CTF at a list/grid of signed integer frequencies.

    col_freq/row_freq: integer frequency arrays of any shape S (cycles/box).
    CTF parameters: arrays broadcastable against a leading batch dim B.
    Returns (B,) + S real CTF values. ``defocus_factor`` scales dU/dV — the
    particle filter's per-particle defocus search dimension
    (src/Optimiser.cpp CTF refinement; THU_DEFOCUS_FACTOR column).
    """
    params = [voltage, defocus_u, defocus_v, defocus_theta, cs, amp_contrast,
              phase_shift, jnp.asarray(defocus_factor)]
    extra = col_freq.ndim
    params = [jnp.asarray(p)[(...,) + (None,) * extra] for p in params]
    (voltage, defocus_u, defocus_v, defocus_theta, cs, amp_contrast,
     phase_shift, defocus_factor) = params

    u = jnp.sqrt(
        (col_freq.astype(jnp.float32) / (pixel_size * n)) ** 2
        + (row_freq.astype(jnp.float32) / (pixel_size * n)) ** 2
    )
    angle = jnp.arctan2(row_freq.astype(jnp.float32), col_freq.astype(jnp.float32)) \
        - defocus_theta
    defocus = -(
        defocus_u + defocus_v + (defocus_u - defocus_v) * jnp.cos(2 * angle)
    ) / 2 * defocus_factor

    lam = wavelength(voltage)
    w1 = jnp.sqrt(1 - amp_contrast**2)
    w2 = amp_contrast
    k1 = jnp.pi * lam
    k2 = jnp.pi / 2 * cs * lam**3
    chi = k1 * defocus * u**2 + k2 * u**4 - phase_shift
    return -w1 * jnp.sin(chi) + w2 * jnp.cos(chi)
