"""Pose-likelihood evaluation — the E-step hot loop.

The reference computes, for every (image, class, rotation, translation),
    logL = sum_px |dat - CTF * proj|^2 * (-0.5 / sigma^2)
with AVX kernels under a mutable streaming baseline
(src/Optimiser.cpp:622-1136, logDataVSPrior_m_n_huabin :9931, SIMD256/512
:9543/:9915; sigRcp = -0.5/sigma src/Optimiser.cpp:5242). On TPU the sum
factors into MXU matmuls, because |T_t| = 1 for phase-ramp translations:

    logL[b,k,r,t] = cst_b
                  + Re sum_p Q[b,p] T[t,p] P[k,r,p]      (Q = -2 sr ctf conj(dat))
                  + sum_p E[b,p] |P[k,r,p]|^2            (E = sr ctf^2)

Term 2 is one real matmul (B,P)x(P,KR); term 1 is one complex-elementwise +
real matmul per translation. The per-image constant cst_b cancels in every
per-image posterior and is dropped.

``global_search_weights`` streams over translations with an online
log-sum-exp baseline carried through lax.scan (replacing the reference's
omp-lock streaming baseline at src/Optimiser.cpp:836-893) and accumulates the
factored posterior marginals

    wC[b,k]   = sum_{r,t} w * priorR[b,r] * priorT[b,t]
    wR[b,k,r] = sum_t     w * priorT[b,t]
    wT[b,k,t] = sum_r     w * priorR[b,r]

(src/Optimiser.cpp:872-894).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..dtypes import real_dtype


def sigma_reciprocal(sig):
    """sigRcp = -0.5 / sigma (src/Optimiser.cpp:5242)."""
    return -0.5 / jnp.maximum(sig, 1e-30)


def log_likelihood_pose(dat, ctf, sig_rcp, pri, pixel_mask=None):
    """Direct (unfactored) logL for explicit pose batches.

    dat/ctf/sig_rcp: (B, P); pri: (B, ..., P) predicted slices (already
    translated). Returns (B, ...).
    Used by the local particle-filter search where each image has its own
    small pose set."""
    d = dat[:, None, :] if pri.ndim == 3 else dat
    c = ctf[:, None, :] if pri.ndim == 3 else ctf
    s = sig_rcp[:, None, :] if pri.ndim == 3 else sig_rcp
    resid = d - c * pri
    val = (resid.real**2 + resid.imag**2) * s
    if pixel_mask is not None:
        val = val * pixel_mask
    return jnp.sum(val, axis=-1)


@partial(jax.jit, static_argnames=())
def global_search_weights(dat, ctf, sig_rcp, proj, tra, prior_r=None, prior_t=None,
                          pixel_mask=None):
    """Factored global-search posterior accumulation.

    dat:  (B, P) complex ring pixels of observed images
    ctf:  (B, P) real
    sig_rcp: (B, P) real, = -0.5/sigma^2 (negative)
    proj: (K, R, P) complex class projections at the scan rotations
    tra:  (T, P) complex translation phase ramps
    prior_r: (B, R) / prior_t: (B, T) — support-point prior weights
      (uniform when None, matching the reset particle filter)
    Returns dict with wC (B, K), wR (B, K, R), wT (B, K, T),
    baseline (B,) and top_logL (B,).
    """
    b, p = dat.shape
    k, r, _ = proj.shape
    t = tra.shape[0]
    if prior_r is None:
        prior_r = jnp.full((b, r), 1.0 / r, dtype=real_dtype)
    if prior_t is None:
        prior_t = jnp.full((b, t), 1.0 / t, dtype=real_dtype)
    pm = 1.0 if pixel_mask is None else pixel_mask

    # Q[b,p] = -2 sr ctf conj(dat); E[b,p] = sr ctf^2
    q = (-2.0 * sig_rcp * ctf * pm) * jnp.conj(dat)
    e = sig_rcp * ctf**2 * pm

    pk = proj.reshape(k * r, p)
    # term2[b, k*r] — one matmul
    term2 = jnp.einsum(
        "bp,np->bn", e, jnp.abs(pk) ** 2, preferred_element_type=jnp.float32
    )

    neg_inf = jnp.asarray(-jnp.inf, real_dtype)

    def step(carry, inputs):
        base, acc_c, acc_r = carry
        tra_t, prior_t_col = inputs  # (P,), (B,)
        qt = q * tra_t[None, :]
        term1 = (
            jnp.einsum("bp,np->bn", qt.real, pk.real,
                       preferred_element_type=jnp.float32)
            - jnp.einsum("bp,np->bn", qt.imag, pk.imag,
                         preferred_element_type=jnp.float32)
        )
        log_l = (term1 + term2).reshape(b, k, r)
        cmax = jnp.max(log_l, axis=(1, 2))
        new_base = jnp.maximum(base, cmax)
        scale = jnp.exp(base - new_base)
        scale = jnp.where(jnp.isfinite(scale), scale, 0.0)
        w = jnp.exp(log_l - new_base[:, None, None])
        wr = w * prior_t_col[:, None, None]  # contribution to wR
        acc_r = acc_r * scale[:, None, None] + wr
        acc_c = acc_c * scale[:, None] + jnp.einsum("bkr,br->bk", wr, prior_r)
        w_t_col = jnp.einsum("bkr,br->bk", w, prior_r)  # (B, K) for this t
        return (new_base, acc_c, acc_r), (w_t_col, new_base)

    init = (
        jnp.full((b,), neg_inf, real_dtype),
        jnp.zeros((b, k), real_dtype),
        jnp.zeros((b, k, r), real_dtype),
    )
    (base, wc, wr), (wt_cols, step_bases) = jax.lax.scan(
        step, init, (tra, prior_t.T)
    )
    # each step's wT column was scaled by exp(-base_t) with the then-current
    # baseline; bring every column to the final baseline
    rescale = jnp.exp(step_bases - base[None, :])  # (T, B)
    wt_cols = wt_cols * rescale[:, :, None]
    wt = jnp.moveaxis(wt_cols, 0, -1)  # (B, K, T)
    return {"wC": wc, "wR": wr, "wT": wt, "baseline": base}


def global_search_weights_fused(dat, ctf, sig_rcp, proj, tra, prior_r=None,
                                prior_t=None, pixel_mask=None,
                                interpret=False):
    """Pallas-fused variant of :func:`global_search_weights`: the whole
    translation scan runs inside one MXU kernel per (image, pose) tile —
    bf16 matmuls, f32 accumulation, VMEM-resident posterior accumulators
    (ops/pallas_likelihood.py). Same inputs/outputs."""
    from . import pallas_likelihood

    b, p = dat.shape
    k, r, _ = proj.shape
    t = tra.shape[0]
    if prior_r is None:
        prior_r = jnp.full((b, r), 1.0 / r, dtype=real_dtype)
    if prior_t is None:
        prior_t = jnp.full((b, t), 1.0 / t, dtype=real_dtype)
    pm = 1.0 if pixel_mask is None else pixel_mask
    q = (-2.0 * sig_rcp * ctf * pm) * jnp.conj(dat)
    e = sig_rcp * ctf**2 * pm
    return pallas_likelihood.global_scan_fused(
        q, e, proj, tra, prior_r, prior_t, k=k, interpret=interpret)


def local_search_weights(dat, ctf, sig_rcp, proj, tra, w_r, w_t, w_d=None,
                         ctf_d=None, pixel_mask=None):
    """Per-image local-search posterior marginals — one particle-filter
    phase's evaluation (src/Optimiser.cpp:1294-1402).

    dat/sig_rcp: (B, P); ctf: (B, P) — used when ctf_d is None
    proj: (B, R, P) per-image projections at the support rotations
    tra:  (B, T, P) per-image translation phase ramps
    w_r/(B, R), w_t/(B, T), w_d/(B, D): current support weights
    ctf_d: (B, D, P) per-defocus-point CTF (CTF search mode)
    Returns u_r (B, R), u_t (B, T), u_d (B, D or 1).

    Same factorization as the global scan; the per-image baseline is the max
    over the full (R, T, D) block (exact log-sum-exp, no streaming needed at
    these sizes: R*T*D ~ 10^4).
    """
    pm = 1.0 if pixel_mask is None else pixel_mask
    if ctf_d is None:
        ctf_d = ctf[:, None, :]  # D = 1
    d_ax = ctf_d.shape[1]
    b = dat.shape[0]
    if w_d is None:
        w_d = jnp.full((b, d_ax), 1.0 / d_ax, dtype=real_dtype)

    # loop the (small, static) defocus axis so the largest intermediate is
    # (B, T, P) — the round-1 (B, D, T, P) qt tensor OOM'd at realistic B
    p2 = proj.real**2 + proj.imag**2  # (B, R, P)
    dat_c = jnp.conj(dat)
    log_l_d = []
    for d in range(d_ax):
        c_d = ctf_d[:, d, :]
        q = (-2.0 * sig_rcp * c_d * pm) * dat_c           # (B, P) complex
        e = sig_rcp * c_d**2 * pm                         # (B, P)
        term2 = jnp.einsum("bp,brp->br", e, p2,
                           preferred_element_type=jnp.float32)
        qt = q[:, None, :] * tra                          # (B, T, P) complex
        term1 = jnp.einsum(
            "btp,brp->brt", qt.real, proj.real,
            preferred_element_type=jnp.float32,
        ) - jnp.einsum(
            "btp,brp->brt", qt.imag, proj.imag,
            preferred_element_type=jnp.float32,
        )
        log_l_d.append(term1 + term2[..., None])          # (B, R, T)
    log_l = jnp.stack(log_l_d, axis=1)                    # (B, D, R, T)
    base = jnp.max(log_l, axis=(1, 2, 3), keepdims=True)
    w = jnp.exp(log_l - base)
    u_r = jnp.einsum("bdrt,bd,bt->br", w, w_d, w_t)
    u_t = jnp.einsum("bdrt,bd,br->bt", w, w_d, w_r)
    u_d = jnp.einsum("bdrt,br,bt->bd", w, w_r, w_t)
    return u_r, u_t, u_d
