"""Pose sampling for the global scan phase.

Matches Particle::reset (src/Particle.cpp:87-170): rotations uniform over
SO(3) (ACG with identity scatter) reduced into the symmetry fundamental
domain, or uniform circle angles in 2D mode (von Mises kappa -> 0);
translations from an isotropic 2D Gaussian with sigma = transS
(PARTICLE_TRANS_INIT_GAUSSIAN). The scan counts follow Optimiser::
expectation (src/Optimiser.cpp:645-665): nR = mS / (1 + #sym elements) in
3D, nT = max(30, round(pi (transS chi2invQ(0.5, 2))^2 transSearchFactor)).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..geom import quat
from ..geom.symmetry import symmetry_counterpart

CHI2_INV_Q_05_DF2 = 1.3862943611198906  # chi^2 quantile Q^-1(0.5, df=2) = 2 ln 2


def n_scan_rotations(m_s, n_sym_elements, mode="3d"):
    if mode == "2d":
        return m_s
    return max(1, m_s // (1 + n_sym_elements))


def n_scan_translations(trans_s, trans_search_factor):
    return max(30, int(round(np.pi * (trans_s * CHI2_INV_Q_05_DF2) ** 2
                             * trans_search_factor)))


def sample_rotations_3d(key, n, sym_quats=None):
    """Uniform rotations (n, 4) quaternions, symmetry-reduced."""
    q = quat.random_quat(key, n)
    if sym_quats is not None and len(sym_quats) > 0:
        q = symmetry_counterpart(q, jnp.asarray(sym_quats, dtype=q.dtype))
    return q


def sample_rotations_2d(key, n):
    """Uniform in-plane angles as (n,) radians."""
    return jax.random.uniform(key, (n,), minval=0.0, maxval=2 * jnp.pi)


def sample_translations(key, n, trans_s):
    """(n, 2) Gaussian translations; first point pinned at zero like the
    reference's top-translation retention."""
    t = trans_s * jax.random.normal(key, (n, 2))
    return t.at[0].set(0.0)
