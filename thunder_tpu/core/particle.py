"""The particle filter over (class, rotation, translation, defocus).

Vectorized re-design of the reference's per-image Particle object
(include/Particle.h:74-1474, src/Particle.cpp): every operation is batched
over the image axis; per-image adaptive phase counts become a masked
``lax.while_loop`` so the whole local search stays inside one jitted program
(replacing the OpenMP per-image loop at src/Optimiser.cpp:1138-1660).

Semantics, with reference cites:
- support-point state: quaternions/translations/defocus with weights w and
  likelihoods u (Particle.h:146-205),
- ``perturb``: rotations perturbed in the tangent frame of the ACG mean by
  ACG(pf^2 k1..k3) samples, translations by N(0, s0/s1 * pf), defocus by
  N(0, s * pf) (Particle.cpp:1149-1290),
- ``keep_half_height_peak``: u <- max(0, u - peakFactor * u_max)
  (Particle.cpp:1964-2004),
- ``cal_vari``: rotations recentred by the ACG mean then k1,k2,k3 =
  diagonal ratios of the scatter (Particle.cpp:1004-1100,
  PARTICLE_ROT_MEAN_USING_STAT_CAL_VARI); translation s0/s1 = per-axis
  stddev, rho = 0 (PARTICLE_RHO off),
- ``resample``: systematic resampling of w * u with uniform output weights
  (Particle.cpp:1291-1505),
- phase termination: after MIN_N_PHASE (10 global / 3 local), stop when no
  variance shrinks below PARTICLE_FILTER_DECREASE_FACTOR of its previous
  value for N_PHASE_WITH_NO_VARI_DECREASE consecutive phases
  (src/Optimiser.cpp:1510-1614, include/Optimiser.h:56-63),
- ``compress_r`` score = (k1 k2 k3)^(-1/6) (Particle.cpp:647-667) — the
  particle-grading weight.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..dtypes import real_dtype
from ..geom import quat
from ..geom.directional import infer_acg, sample_acg_k123

# include/Particle.h:52-64, include/Optimiser.h:56-63
PEAK_FACTOR_C = 1 - 1e-2
PEAK_FACTOR_MAX = 0.5
PEAK_FACTOR_MIN = 1e-3
PEAK_FACTOR_BASE = 2
PERTURB_K_MAX = 1.0
MIN_N_PHASE_PER_ITER_GLOBAL = 10
MIN_N_PHASE_PER_ITER_LOCAL = 3
MAX_N_PHASE_PER_ITER = 100
N_PHASE_WITH_NO_VARI_DECREASE = 1
PARTICLE_FILTER_DECREASE_FACTOR = 0.95


def make_state(b, n_r, n_t, n_d=1):
    """Batched particle-filter state pytree."""
    e = jnp.tile(jnp.asarray([1.0, 0, 0, 0], real_dtype), (b, n_r, 1))
    return {
        "r": e,                                    # (B, nR, 4)
        "t": jnp.zeros((b, n_t, 2), real_dtype),   # (B, nT, 2)
        "d": jnp.ones((b, n_d), real_dtype),       # (B, nD)
        "wR": jnp.full((b, n_r), 1.0 / n_r, real_dtype),
        "wT": jnp.full((b, n_t), 1.0 / n_t, real_dtype),
        "wD": jnp.full((b, n_d), 1.0 / n_d, real_dtype),
        "topR": jnp.tile(jnp.asarray([1.0, 0, 0, 0], real_dtype), (b, 1)),
        "topT": jnp.zeros((b, 2), real_dtype),
        "topD": jnp.ones((b,), real_dtype),
        "k1": jnp.ones((b,), real_dtype),
        "k2": jnp.ones((b,), real_dtype),
        "k3": jnp.ones((b,), real_dtype),
        "s0": jnp.ones((b,), real_dtype),
        "s1": jnp.ones((b,), real_dtype),
        "sD": jnp.zeros((b,), real_dtype),
    }


def _systematic_resample(key, w, points, n_out):
    """Systematic resampling, batched. w: (B, n_in); points: (B, n_in, ...).
    Returns resampled points (B, n_out, ...)."""
    b, n_in = w.shape
    w = jnp.maximum(w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-30)
    cdf = jnp.cumsum(w, axis=-1)
    cdf = cdf / jnp.maximum(cdf[..., -1:], 1e-30)
    u0 = jax.random.uniform(key, (b, 1), dtype=w.dtype) / n_out
    pos = u0 + jnp.arange(n_out, dtype=w.dtype)[None, :] / n_out
    idx = jax.vmap(jnp.searchsorted)(cdf, pos)
    idx = jnp.clip(idx, 0, n_in - 1)
    return jnp.take_along_axis(
        points, idx.reshape(idx.shape + (1,) * (points.ndim - 2)), axis=1
    )


def resample_rotations(key, w, r, n_out):
    return _systematic_resample(key, w, r, n_out)


def keep_half_height_peak(u, peak_factor):
    """u <- max(0, u - pf * max(u)) along the support axis."""
    hh = jnp.max(u, axis=-1, keepdims=True) * peak_factor
    return jnp.maximum(u - hh, 0.0)


def _infer_acg_batch(q, w=None):
    return jax.vmap(lambda qq: infer_acg(qq, None))(q) if w is None else jax.vmap(infer_acg)(q, w)


def cal_vari_r(r):
    """(k1, k2, k3) per image from the support rotations (B, nR, 4):
    recentre by the ACG principal axis, then diagonal ratios."""
    a = _infer_acg_batch(r)
    _, vecs = jnp.linalg.eigh(a)
    mean = vecs[..., -1]  # (B, 4)
    mean = mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)
    r_c = quat.quat_mul(quat.quat_conj(mean)[:, None, :], r)
    a2 = _infer_acg_batch(r_c)
    d0 = jnp.maximum(a2[..., 0, 0], 1e-30)
    return (
        a2[..., 1, 1] / d0,
        a2[..., 2, 2] / d0,
        a2[..., 3, 3] / d0,
        mean,
    )


def cal_vari_t(t):
    """(s0, s1) per image: per-axis stddev about the mean."""
    s = jnp.std(t, axis=1)
    return s[:, 0], s[:, 1]


def cal_vari_d(d):
    return jnp.std(d, axis=1)


def perturb_r(key, r, k1, k2, k3, pf, top_r=None):
    """Perturb support rotations in the tangent frame of their ACG mean."""
    b, n_r, _ = r.shape
    a = _infer_acg_batch(r)
    _, vecs = jnp.linalg.eigh(a)
    mean = vecs[..., -1]
    mean = mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)

    kk1 = (pf**2) * jnp.minimum(PERTURB_K_MAX, k1)
    kk2 = (pf**2) * jnp.minimum(PERTURB_K_MAX, k2)
    kk3 = (pf**2) * jnp.minimum(PERTURB_K_MAX, k3)

    keys = jax.random.split(key, b)

    def one(key_i, kk):
        return sample_acg_k123(key_i, kk[0], kk[1], kk[2], n_r, dtype=r.dtype)

    d = jax.vmap(one)(keys, jnp.stack([kk1, kk2, kk3], axis=-1))  # (B, nR, 4)
    mean_e = mean[:, None, :]
    local = quat.quat_mul(quat.quat_conj(mean_e), r)
    local = quat.quat_mul(d, local)
    return quat.quat_mul(mean_e, local)


def perturb_t(key, t, s0, s1, pf):
    b, n_t, _ = t.shape
    eps = jax.random.normal(key, (b, n_t, 2), dtype=t.dtype)
    s = jnp.stack([s0, s1], axis=-1)[:, None, :]
    return t + eps * s * pf


def perturb_d(key, d, s, pf):
    eps = jax.random.normal(key, d.shape, dtype=d.dtype)
    return d + eps * s[:, None] * pf


def update_from_likelihood(state, key, u_r, u_t, u_d=None,
                           peak_factor_r=0.0, peak_factor_t=0.0,
                           with_d=False):
    """One phase's posterior update: set u, peak-clip, rank-1st, cal_vari,
    resample back to the static support sizes."""
    kr, kt, kd = jax.random.split(key, 3)
    n_r = state["r"].shape[1]
    n_t = state["t"].shape[1]

    u_r = keep_half_height_peak(u_r, peak_factor_r) if peak_factor_r else u_r
    u_t = keep_half_height_peak(u_t, peak_factor_t) if peak_factor_t else u_t

    top_r_idx = jnp.argmax(u_r, axis=-1)
    top_t_idx = jnp.argmax(u_t, axis=-1)
    top_r = jnp.take_along_axis(state["r"], top_r_idx[:, None, None], axis=1)[:, 0]
    top_t = jnp.take_along_axis(state["t"], top_t_idx[:, None, None], axis=1)[:, 0]

    # variance from the CURRENT (perturbed) support, unweighted, BEFORE
    # resampling — the reference's calVari/resample order
    # (src/Optimiser.cpp:1474-1483). Resampling alone would collapse the
    # spread to duplicated points.
    k1, k2, k3, _ = cal_vari_r(state["r"])
    s0, s1 = cal_vari_t(state["t"])

    w_r = state["wR"] * u_r
    w_t = state["wT"] * u_t
    r_new = _systematic_resample(kr, w_r, state["r"], n_r)
    t_new = _systematic_resample(kt, w_t, state["t"], n_t)

    out = {
        **state,
        "r": r_new,
        "t": t_new,
        "wR": jnp.full_like(state["wR"], 1.0 / n_r),
        "wT": jnp.full_like(state["wT"], 1.0 / n_t),
        "topR": top_r,
        "topT": top_t,
        "k1": k1, "k2": k2, "k3": k3,
        "s0": s0, "s1": s1,
    }
    if with_d and u_d is not None:
        n_d = state["d"].shape[1]
        top_d_idx = jnp.argmax(u_d, axis=-1)
        out["topD"] = jnp.take_along_axis(state["d"], top_d_idx[:, None], axis=1)[:, 0]
        out["sD"] = cal_vari_d(state["d"])
        d_new = _systematic_resample(kd, state["wD"] * u_d,
                                     state["d"][..., None], n_d)[..., 0]
        out["d"] = d_new
        out["wD"] = jnp.full_like(state["wD"], 1.0 / n_d)
    return out


def vari_shrank(state, prev):
    """Per-image: did any variance shrink below the decrease factor
    (3D criterion, src/Optimiser.cpp:1568-1590)?"""
    f = PARTICLE_FILTER_DECREASE_FACTOR
    f2 = f * f
    return (
        (state["k1"] < prev["k1"] * f2)
        | (state["k2"] < prev["k2"] * f2)
        | (state["k3"] < prev["k3"] * f2)
        | (state["s0"] < prev["s0"] * f)
        | (state["s1"] < prev["s1"] * f)
        | (state["sD"] < prev["sD"] * f)
    )


def compress_r(state):
    """Particle-grading score (Particle.cpp:647-667)."""
    return (jnp.maximum(state["k1"] * state["k2"] * state["k3"], 1e-30)) ** (-1.0 / 6)


def init_from_scan(key, w_r, w_t, scan_quats, scan_trans, n_r, n_t, n_d=1,
                   peak_factor_r=0.0, peak_factor_t=0.0):
    """Seed each image's filter from the global-scan posterior marginals
    (src/Optimiser.cpp:925-1118): peak-clip, resample scan points into the
    local support, infer initial variance."""
    b = w_r.shape[0]
    kr, kt = jax.random.split(key)
    u_r = keep_half_height_peak(w_r, peak_factor_r) if peak_factor_r else w_r
    u_t = keep_half_height_peak(w_t, peak_factor_t) if peak_factor_t else w_t
    r_pts = jnp.broadcast_to(scan_quats[None], (b,) + scan_quats.shape)
    t_pts = jnp.broadcast_to(scan_trans[None], (b,) + scan_trans.shape)
    r_new = _systematic_resample(kr, u_r, r_pts, n_r)
    t_new = _systematic_resample(kt, u_t, t_pts, n_t)

    state = make_state(b, n_r, n_t, n_d)
    top_r = jnp.take_along_axis(r_pts, jnp.argmax(u_r, axis=-1)[:, None, None], axis=1)[:, 0]
    top_t = jnp.take_along_axis(t_pts, jnp.argmax(u_t, axis=-1)[:, None, None], axis=1)[:, 0]
    k1, k2, k3, _ = cal_vari_r(r_new)
    s0, s1 = cal_vari_t(t_new)
    # minimum stddev floors (src/Optimiser.cpp:1080-1118): scan granularity
    min_k = jnp.asarray((scan_quats.shape[0]) ** (-2.0 / 3), real_dtype)
    return {
        **state,
        "r": r_new, "t": t_new,
        "topR": top_r, "topT": top_t,
        "k1": jnp.maximum(k1, min_k),
        "k2": jnp.maximum(k2, min_k),
        "k3": jnp.maximum(k3, min_k),
        "s0": jnp.maximum(s0, 0.3), "s1": jnp.maximum(s1, 0.3),
    }
