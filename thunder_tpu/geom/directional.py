"""Directional statistics: Angular Central Gaussian (ACG) over unit
quaternions and von Mises (VMS) over the circle.

These drive the particle filter's pose posteriors. Semantics follow
src/Geometry/DirectionalStat.cpp:

- ``sample_acg``: q = L v / |L v| with v ~ N(0, I4), L = chol(Sigma)
  (DirectionalStat.cpp:39-62).
- ``infer_acg``: Tyler fixed-point iteration
  B = 4 * sum_i(q_i q_i^T / u_i) / sum_i(1 / u_i), u_i = q_i^T A^-1 q_i
  (DirectionalStat.cpp:93-144), here with optional weights and a fixed
  iteration count so it stays jittable; returns the 4x4 scatter A.
- ``infer_acg_k0k1`` / ``infer_acg_k123`` / ``infer_acg_mean``: spectral /
  diagonal-ratio reductions of A (DirectionalStat.cpp:146-252).
- ``sample_vms``: Best-Fisher wrapped rejection sampler with the reference's
  k -> kappa reparameterization kappa = (1-k)(1+2k-k^2)/(k(2-k))
  (DirectionalStat.cpp:264-318); on TPU the rejection loop is a fixed
  number of proposal rounds with masked accept (first accepted wins).
- ``infer_vms``: mean resultant length, k = 1 - R
  (DirectionalStat.cpp:334-357).

All functions are batched (leading dims) and pure; keys are explicit.
"""

import jax
import jax.numpy as jnp

ACG_FIXED_POINT_ITERS = 30
VMS_PROPOSAL_ROUNDS = 8


def pdf_acg(x, sig):
    """ACG pdf on S^3. x: (..., 4); sig: (..., 4, 4)."""
    det = jnp.linalg.det(sig)
    inv = jnp.linalg.inv(sig)
    u = jnp.einsum("...i,...ij,...j->...", x, inv, x)
    area = 2 * jnp.pi**2  # surface area of S^3
    return 1.0 / (area * jnp.sqrt(det)) * u ** (-2.0)


def sample_acg(key, sig, n):
    """Sample n quaternions from ACG(sig). sig: (4, 4) -> (n, 4)."""
    ell = jnp.linalg.cholesky(sig)
    v = jax.random.normal(key, (n, 4), dtype=sig.dtype)
    q = v @ ell.T
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def sample_acg_k0k1(key, k0, k1, n, dtype=jnp.float32):
    sig = jnp.diag(jnp.asarray([k0, k1, k1, k1], dtype=dtype))
    return sample_acg(key, sig, n)


def sample_acg_k123(key, k1, k2, k3, n, dtype=jnp.float32):
    sig = jnp.diag(jnp.stack([jnp.ones_like(k1), k1, k2, k3]).astype(dtype))
    return sample_acg(key, sig, n)


def infer_acg(q, w=None, n_iter=ACG_FIXED_POINT_ITERS):
    """Weighted Tyler fixed-point estimate of the ACG scatter matrix.

    q: (n, 4) support quaternions; w: (n,) nonnegative weights (default
    uniform). Returns A: (4, 4), normalized so trace-free scaling matches the
    reference (B *= 4 / nf).
    """
    n = q.shape[0]
    if w is None:
        w = jnp.ones((n,), dtype=q.dtype)
    w = w / jnp.maximum(jnp.sum(w), 1e-30)
    outer = q[:, :, None] * q[:, None, :]  # (n, 4, 4)

    def body(_, a):
        # trace-relative ridge keeps the iteration well-conditioned in f32
        # when the support collapses toward a single point (rank-1 scatter —
        # a fully-converged filter); the bias is far below the filter's
        # minimum-concentration floors
        ridge = 1e-4 * (jnp.trace(a) / 4.0) * jnp.eye(4, dtype=a.dtype)
        sol = jnp.linalg.solve(a + ridge, q.T)  # (4, n)
        u = jnp.einsum("ni,in->n", q, sol)
        u = jnp.maximum(u, 1e-8)
        b = jnp.einsum("n,nij->ij", w / u, outer)
        nf = jnp.sum(w / u)
        return 4.0 * b / jnp.maximum(nf, 1e-30)

    a = jax.lax.fori_loop(0, n_iter, body, jnp.eye(4, dtype=q.dtype))
    return a


def infer_acg_k0k1(q, w=None):
    """Top-two eigenvalues of the scatter matrix (DirectionalStat.cpp:146-166)."""
    a = infer_acg(q, w)
    ev = jnp.linalg.eigvalsh(a)  # ascending
    return ev[-1], ev[-2]


def infer_acg_k(q, w=None):
    k0, k1 = infer_acg_k0k1(q, w)
    return k1 / jnp.maximum(k0, 1e-30)


def infer_acg_k123(q, w=None):
    """Diagonal ratios A11/A00, A22/A00, A33/A00 (DirectionalStat.cpp:181-216)."""
    a = infer_acg(q, w)
    d = jnp.maximum(a[0, 0], 1e-30)
    return a[1, 1] / d, a[2, 2] / d, a[3, 3] / d


def infer_acg_mean(q, w=None):
    """Principal eigenvector of the scatter matrix (DirectionalStat.cpp:218-252)."""
    a = infer_acg(q, w)
    _, vecs = jnp.linalg.eigh(a)
    mean = vecs[:, -1]
    return mean / jnp.linalg.norm(mean)


def _vms_kappa(k):
    k = jnp.clip(k, 1e-6, 1.0)
    return (1 - k) * (1 + 2 * k - k**2) / (k * (2 - k))


def pdf_vms(x, mu, k):
    """VMS pdf on the circle; Gaussian tail approx above kappa=5 like the
    reference (DirectionalStat.cpp:252-262)."""
    kappa = _vms_kappa(k)
    dot = jnp.sum(x * mu, axis=-1)
    small = jnp.exp(kappa * dot) / (2 * jnp.pi * _bessel_i0(kappa))
    d = jnp.linalg.norm(x - mu, axis=-1)
    s = jnp.sqrt(1.0 / kappa)
    big = jnp.exp(-0.5 * (d / s) ** 2) / (s * jnp.sqrt(2 * jnp.pi))
    return jnp.where(kappa < 5, small, big)


def _bessel_i0(x):
    """Modified Bessel I0 via Abramowitz & Stegun 9.8.1/9.8.2 polynomials."""
    ax = jnp.abs(x)
    t = ax / 3.75
    t2 = t * t
    small = 1.0 + t2 * (
        3.5156229
        + t2 * (3.0899424 + t2 * (1.2067492 + t2 * (0.2659732 + t2 * (0.0360768 + t2 * 0.0045813))))
    )
    it = 3.75 / jnp.maximum(ax, 1e-30)
    big = (
        jnp.exp(ax)
        / jnp.sqrt(jnp.maximum(ax, 1e-30))
        * (
            0.39894228
            + it
            * (
                0.01328592
                + it
                * (
                    0.00225319
                    + it
                    * (
                        -0.00157565
                        + it
                        * (
                            0.00916281
                            + it
                            * (-0.02057706 + it * (0.02635537 + it * (-0.01647633 + it * 0.00392377)))
                        )
                    )
                )
            )
        )
    )
    return jnp.where(ax < 3.75, small, big)


def sample_vms(key, mu, k, n):
    """Sample n unit 2-vectors from VMS(mu, k) with the reference's
    parameterization. mu: (2,). Returns (n, 2).

    The Best-Fisher rejection loop becomes VMS_PROPOSAL_ROUNDS masked
    proposal rounds; if none accepts (prob < 1e-3 for any kappa) the last
    proposal is used.
    """
    kappa = _vms_kappa(k)
    ku, kz, ks = jax.random.split(key, 3)

    a = 1 + jnp.sqrt(1 + 4 * kappa**2)
    b = (a - jnp.sqrt(2 * a)) / (2 * kappa)
    r = (1 + b**2) / (2 * b)

    z = jnp.cos(jnp.pi * jax.random.uniform(kz, (VMS_PROPOSAL_ROUNDS, n)))
    f = (1 + r * z) / (r + z)
    c = kappa * (r - f)
    u2 = jax.random.uniform(ku, (VMS_PROPOSAL_ROUNDS, n), minval=1e-12)
    accept = jnp.logical_or(c * (2 - c) > u2, jnp.log(c / u2) + 1 - c >= 0)
    # first accepted proposal per sample; fall back to the last one
    idx = jnp.argmax(accept, axis=0)
    idx = jnp.where(jnp.any(accept, axis=0), idx, VMS_PROPOSAL_ROUNDS - 1)
    f = jnp.take_along_axis(f, idx[None, :], axis=0)[0]  # (n,)

    delta = jnp.sqrt(jnp.maximum((1 - f) * (f + 1), 0.0))
    sign = jnp.where(jax.random.uniform(ks, (n,)) > 0.5, 1.0, -1.0)
    x0 = mu[0] * f + sign * delta * mu[1]
    x1 = mu[1] * f - sign * delta * mu[0]
    vm = jnp.stack([x0, x1], axis=-1)

    # kappa < 0.1: uniform on the circle (DirectionalStat.cpp:273-277)
    theta = jax.random.uniform(kz, (n,), maxval=2 * jnp.pi)
    uni = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return jnp.where(kappa < 1e-1, uni, vm)


def sample_vms_quat(key, mu4, k, n):
    """2D-mode variant: rotation lives in the first two quaternion slots
    (DirectionalStat.cpp:320-332)."""
    v = sample_vms(key, mu4[:2], k, n)
    return jnp.concatenate([v, jnp.zeros_like(v)], axis=-1)


def infer_vms(x, w=None):
    """Weighted mean-resultant inference: mu = normalized weighted mean,
    k = 1 - R (DirectionalStat.cpp:334-357). x: (n, 2)."""
    if w is None:
        w = jnp.ones(x.shape[0], dtype=x.dtype)
    w = w / jnp.maximum(jnp.sum(w), 1e-30)
    m = jnp.einsum("n,ni->i", w, x)
    big_r = jnp.linalg.norm(m)
    mu = m / jnp.maximum(big_r, 1e-30)
    return mu, 1 - big_r
