"""The particle filter over (class, rotation, translation, defocus).

Vectorized re-design of the reference's per-image Particle object
(include/Particle.h:74-1474, src/Particle.cpp): every operation is batched
over the image axis and drives its randomness from PER-IMAGE keys, so
results are independent of how the image batch is sharded over a device
mesh (the reference gets the same property from per-thread GSL engines).

Semantics, with reference cites:
- support-point state: quaternions/translations/defocus with weights w and
  likelihoods u (Particle.h:146-205),
- ``perturb``: 3D rotations perturbed in the tangent frame of the ACG mean
  by ACG(pf^2 k1..k3) samples then re-symmetrised about the mean
  (Particle.cpp:1149-1290 incl. the :1234 symmetrise); 2D rotations by
  von-Mises angle increments (:1160-1178); translations by
  N(0, s0/s1 * pf); defocus by N(0, s * pf),
- ``keep_half_height_peak``: u <- max(0, u - peakFactor * u_max) with the
  PER-IMAGE adaptive peakFactor of Particle::setPeakFactor
  (Particle.cpp:1890-1955): the ratio of the q-th largest likelihood to the
  largest, clamped to [PEAK_FACTOR_MIN, PEAK_FACTOR_MAX]; q = nR/8 for 3D
  rotations (PEAK_FACTOR_BASE^3), nR/2 in 2D, chi2_P(1,2)*nT for
  translations, chi2_P(1,1)*nD for defocus, constant 1-1e-2 for class,
- ``cal_vari``: support rotations are first mapped to their symmetry
  counterparts about a random support anchor (Particle.cpp:1032-1036),
  recentred by the ACG mean, then k1,k2,k3 = diagonal ratios of the scatter
  (:1004-1100, PARTICLE_ROT_MEAN_USING_STAT_CAL_VARI); 2D: k1 = 1 - R of
  the von-Mises resultant (:1014); translation s0/s1 = per-axis stddev,
  rho = 0 (PARTICLE_RHO off),
- ``resample``: systematic resampling of w * u with uniform output weights
  (Particle.cpp:1291-1505),
- phase termination: after MIN_N_PHASE (10 global / 3 local), stop when no
  variance shrinks below PARTICLE_FILTER_DECREASE_FACTOR of its previous
  value for N_PHASE_WITH_NO_VARI_DECREASE consecutive phases
  (src/Optimiser.cpp:1510-1614; 2D uses k1/s0/s1/d linearly, 3D squares the
  factor for k1..k3),
- ``compress_r`` score = (k1 k2 k3)^(-1/6) (Particle.cpp:647-667) — the
  particle-grading weight.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..dtypes import real_dtype
from ..geom import quat
from ..geom.directional import infer_acg, sample_acg_k123, sample_vms
from ..geom.symmetry import symmetry_counterpart

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

CHI2_P_1_DF2 = 0.3934693402873666  # gsl_cdf_chisq_P(1, 2)
CHI2_P_1_DF1 = 0.6826894921370859  # gsl_cdf_chisq_P(1, 1)


def make_state(b, n_r, n_t, n_d=1):
    """Batched particle-filter state pytree."""
    e = jnp.tile(jnp.asarray([1.0, 0, 0, 0], real_dtype), (b, n_r, 1))
    return {
        "r": e,                                    # (B, nR, 4)
        "t": jnp.zeros((b, n_t, 2), real_dtype),   # (B, nT, 2)
        "d": jnp.ones((b, n_d), real_dtype),       # (B, nD)
        "c": jnp.zeros((b,), jnp.int32),           # class (nC=1 post-scan)
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
        # per-image adaptive peak factors (Particle.cpp:1890-1955)
        "pfR": jnp.full((b,), PEAK_FACTOR_MIN, real_dtype),
        "pfT": jnp.full((b,), PEAK_FACTOR_MIN, real_dtype),
        "pfD": jnp.full((b,), PEAK_FACTOR_MIN, real_dtype),
    }


def split_keys(key, b, n=1):
    """(B, n, 2) uint32 per-image keys (layout-independent: derived by
    folding the image index, not by position in a batch split)."""
    ks = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(b * n))
    return ks.reshape(b, n, 2) if n > 1 else ks.reshape(b, 2)


def _systematic_resample(keys, w, points, n_out):
    """Systematic resampling, batched with per-image keys.
    w: (B, n_in); points: (B, n_in, ...). Returns (B, n_out, ...)."""
    b, n_in = w.shape
    w = jnp.maximum(w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-30)
    cdf = jnp.cumsum(w, axis=-1)
    cdf = cdf / jnp.maximum(cdf[..., -1:], 1e-30)
    u0 = jax.vmap(lambda k: jax.random.uniform(k, (), dtype=w.dtype))(keys)
    pos = u0[:, None] / n_out + jnp.arange(n_out, dtype=w.dtype)[None, :] / n_out
    idx = jax.vmap(jnp.searchsorted)(cdf, pos)
    idx = jnp.clip(idx, 0, n_in - 1)
    return jnp.take_along_axis(
        points, idx.reshape(idx.shape + (1,) * (points.ndim - 2)), axis=1
    )


def resample_rotations(keys, w, r, n_out):
    return _systematic_resample(keys, w, r, n_out)


def keep_half_height_peak(u, peak_factor):
    """u <- max(0, u - pf * max(u)) along the support axis
    (Particle::keepHalfHeightPeak, Particle.cpp:1964-2004).
    peak_factor: scalar or (B, 1) per-image."""
    hh = jnp.max(u, axis=-1, keepdims=True) * peak_factor
    return jnp.maximum(u - hh, 0.0)


def cal_peak_factor(u, idx):
    """Per-image adaptive peak factor (Particle::setPeakFactor,
    Particle.cpp:1890-1955): u's idx-th largest over its largest, clamped."""
    u_desc = -jnp.sort(-u, axis=-1)
    ratio = u_desc[..., idx] / jnp.maximum(u_desc[..., 0], 1e-30)
    return jnp.clip(ratio, PEAK_FACTOR_MIN, PEAK_FACTOR_MAX)


def peak_idx_r(n_r, mode="3d"):
    return n_r // 2 if mode == "2d" else n_r // PEAK_FACTOR_BASE**3


def peak_idx_t(n_t):
    return min(n_t - 1, int(n_t * CHI2_P_1_DF2))


def peak_idx_d(n_d):
    return min(n_d - 1, int(n_d * CHI2_P_1_DF1))


def _infer_acg_batch(q, w=None):
    return jax.vmap(lambda qq: infer_acg(qq, None))(q) if w is None else jax.vmap(infer_acg)(q, w)


def _acg_mean(r):
    a = _infer_acg_batch(r)
    _, vecs = jnp.linalg.eigh(a)
    mean = vecs[..., -1]  # (B, 4)
    return mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)


def symmetrise_r(r, sym_quats, anchor):
    """Map support rotations to the group counterpart nearest ``anchor``
    (Particle::symmetrise, Particle.cpp:2445-2471). r: (B, nR, 4);
    anchor: (B, 4); sym_quats: (G, 4) without identity (no-op when empty)."""
    if sym_quats is None or sym_quats.shape[0] == 0:
        return r
    return symmetry_counterpart(r, sym_quats, anchor=anchor[:, None, :])


def cal_vari_r(r, keys=None, sym_quats=None):
    """(k1, k2, k3, symmetrised support) per image (calVari PAR_R,
    Particle.cpp:1004-1100): symmetrise about a random support anchor,
    recentre by the ACG mean, diagonal ratios of the scatter."""
    if sym_quats is not None and sym_quats.shape[0] > 0 and keys is not None:
        n_r = r.shape[1]
        ai = jax.vmap(
            lambda k: jax.random.randint(k, (), 0, n_r))(keys)
        anchor = jnp.take_along_axis(r, ai[:, None, None], axis=1)[:, 0]
        r = symmetrise_r(r, sym_quats, anchor)
    mean = _acg_mean(r)
    r_c = quat.quat_mul(quat.quat_conj(mean)[:, None, :], r)
    a2 = _infer_acg_batch(r_c)
    d0 = jnp.maximum(a2[..., 0, 0], 1e-30)
    return a2[..., 1, 1] / d0, a2[..., 2, 2] / d0, a2[..., 3, 3] / d0, r


def cal_vari_r_2d(r):
    """2D rotation concentration: k1 = 1 - |resultant| of the (cos, sin)
    support vectors (inferVMS, DirectionalStat.cpp:334-357)."""
    m = jnp.mean(r[..., :2], axis=1)
    big_r = jnp.linalg.norm(m, axis=-1)
    return jnp.clip(1.0 - big_r, 1e-6, 1.0)


def cal_vari_t(t):
    """(s0, s1) per image: per-axis stddev about the mean."""
    s = jnp.std(t, axis=1)
    return s[:, 0], s[:, 1]


def cal_vari_d(d):
    return jnp.std(d, axis=1)


def perturb_r(keys, r, k1, k2, k3, pf, sym_quats=None):
    """Perturb 3D support rotations in the tangent frame of their ACG mean,
    then re-symmetrise about the mean (Particle::perturb PAR_R,
    Particle.cpp:1180-1240). keys: (B, 2) per-image."""
    b, n_r, _ = r.shape
    mean = _acg_mean(r)
    kk1 = (pf**2) * jnp.minimum(PERTURB_K_MAX, k1)
    kk2 = (pf**2) * jnp.minimum(PERTURB_K_MAX, k2)
    kk3 = (pf**2) * jnp.minimum(PERTURB_K_MAX, k3)

    def one(key_i, kk):
        return sample_acg_k123(key_i, kk[0], kk[1], kk[2], n_r, dtype=r.dtype)

    d = jax.vmap(one)(keys, jnp.stack([kk1, kk2, kk3], axis=-1))  # (B, nR, 4)
    mean_e = mean[:, None, :]
    local = quat.quat_mul(quat.quat_conj(mean_e), r)
    local = quat.quat_mul(d, local)
    out = quat.quat_mul(mean_e, local)
    if sym_quats is not None and sym_quats.shape[0] > 0:
        out = symmetrise_r(out, sym_quats, mean)
    return out


def perturb_r_2d(keys, r, k1, pf):
    """2D: in-plane angle increments ~ VMS(min(1, k1 * pf)) composed onto
    the (cos, sin) support vectors (Particle.cpp:1160-1178). The (w, x)
    quaternion slots hold (cos phi, sin phi); composition is complex mul."""
    b, n_r, _ = r.shape
    kk = jnp.minimum(PERTURB_K_MAX, k1 * pf)
    mu = jnp.asarray([1.0, 0.0], r.dtype)

    def one(key_i, k_i):
        return sample_vms(key_i, mu, k_i, n_r)  # (nR, 2)

    d = jax.vmap(one)(keys, kk)
    c, s = r[..., 0], r[..., 1]
    dc, ds = d[..., 0], d[..., 1]
    out = jnp.stack([c * dc - s * ds, c * ds + s * dc], axis=-1)
    return jnp.concatenate([out, jnp.zeros_like(out)], axis=-1)


def perturb_t(keys, t, s0, s1, pf):
    b, n_t, _ = t.shape
    eps = jax.vmap(lambda k: jax.random.normal(k, (n_t, 2), dtype=t.dtype))(keys)
    s = jnp.stack([s0, s1], axis=-1)[:, None, :]
    return t + eps * s * pf


def perturb_d(keys, d, s, pf):
    n_d = d.shape[1]
    eps = jax.vmap(lambda k: jax.random.normal(k, (n_d,), dtype=d.dtype))(keys)
    return d + eps * s[:, None] * pf


def update_from_likelihood(state, keys, u_r, u_t, u_d=None, with_d=False,
                           sym_quats=None, mode="3d"):
    """One phase's posterior update: peak-clip with the per-image adaptive
    factors, rank-1st, symmetrised cal_vari, resample back to the static
    support sizes (src/Optimiser.cpp:1404-1496). keys: (B, 4, 2)."""
    kr, kt, kd, ka = keys[:, 0], keys[:, 1], keys[:, 2], keys[:, 3]
    n_r = state["r"].shape[1]
    n_t = state["t"].shape[1]

    u_r = keep_half_height_peak(u_r, state["pfR"][:, None])
    u_t = keep_half_height_peak(u_t, state["pfT"][:, None])

    top_r_idx = jnp.argmax(u_r, axis=-1)
    top_t_idx = jnp.argmax(u_t, axis=-1)
    top_r = jnp.take_along_axis(state["r"], top_r_idx[:, None, None], axis=1)[:, 0]
    top_t = jnp.take_along_axis(state["t"], top_t_idx[:, None, None], axis=1)[:, 0]

    # variance from the CURRENT (perturbed) support, unweighted, BEFORE
    # resampling — the reference's calVari/resample order
    # (src/Optimiser.cpp:1474-1483). Resampling alone would collapse the
    # spread to duplicated points.
    if mode == "2d":
        k1 = cal_vari_r_2d(state["r"])
        k2, k3, r_v = k1, k1, state["r"]
    else:
        k1, k2, k3, r_v = cal_vari_r(state["r"], keys=ka, sym_quats=sym_quats)
    s0, s1 = cal_vari_t(state["t"])

    w_r = state["wR"] * u_r
    w_t = state["wT"] * u_t
    r_new = _systematic_resample(kr, w_r, r_v, n_r)
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
        u_d = keep_half_height_peak(u_d, state["pfD"][:, None])
        top_d_idx = jnp.argmax(u_d, axis=-1)
        out["topD"] = jnp.take_along_axis(state["d"], top_d_idx[:, None], axis=1)[:, 0]
        out["sD"] = cal_vari_d(state["d"])
        d_new = _systematic_resample(kd, state["wD"] * u_d,
                                     state["d"][..., None], n_d)[..., 0]
        out["d"] = d_new
        out["wD"] = jnp.full_like(state["wD"], 1.0 / n_d)
    return out


def vari_shrank(state, prev, mode="3d"):
    """Per-image: did any variance shrink below the decrease factor
    (src/Optimiser.cpp:1536-1590; 2D keys off k1/s0/s1/sD linearly, 3D
    squares the factor for the rotation concentrations)?"""
    f = PARTICLE_FILTER_DECREASE_FACTOR
    trans = (
        (state["s0"] < prev["s0"] * f)
        | (state["s1"] < prev["s1"] * f)
        | (state["sD"] < prev["sD"] * f)
    )
    if mode == "2d":
        return (state["k1"] < prev["k1"] * f) | trans
    f2 = f * f
    return (
        (state["k1"] < prev["k1"] * f2)
        | (state["k2"] < prev["k2"] * f2)
        | (state["k3"] < prev["k3"] * f2)
        | trans
    )


def compress_r(state):
    """Particle-grading score (Particle.cpp:647-667)."""
    return (jnp.maximum(state["k1"] * state["k2"] * state["k3"], 1e-30)) ** (-1.0 / 6)


def init_from_scan(keys, w_c, w_r, w_t, scan_quats, scan_trans, n_r, n_t,
                   n_d=1, mode="3d"):
    """Seed each image's filter from the global-scan posterior marginals
    (src/Optimiser.cpp:925-1118): peak-clip class with the constant
    PEAK_FACTOR_C and DRAW the class from the clipped posterior (resample +
    rand, :955-960); compute the per-image adaptive peak factors for R/T
    from the drawn class's scan likelihoods (setPeakFactor, :968-974),
    peak-clip, resample scan points into the local support, infer initial
    variance with minimum-stddev floors (:1080-1118).

    keys: (B, 3, 2); w_c: (B, K); w_r: (B, K, R); w_t: (B, K, T).
    """
    b, k_cls = w_c.shape
    kc, kr, kt = keys[:, 0], keys[:, 1], keys[:, 2]
    # class: peak-clip + posterior draw
    u_c = keep_half_height_peak(w_c, PEAK_FACTOR_C)
    logits = jnp.log(jnp.maximum(u_c, 1e-30))
    cls = jax.vmap(lambda k, lg: jax.random.categorical(k, lg))(kc, logits)
    cls = cls.astype(jnp.int32)

    u_r = jnp.take_along_axis(w_r, cls[:, None, None], axis=1)[:, 0]  # (B, R)
    u_t = jnp.take_along_axis(w_t, cls[:, None, None], axis=1)[:, 0]  # (B, T)
    pf_r = cal_peak_factor(u_r, peak_idx_r(u_r.shape[-1], mode))
    pf_t = cal_peak_factor(u_t, peak_idx_t(u_t.shape[-1]))
    u_r = keep_half_height_peak(u_r, pf_r[:, None])
    u_t = keep_half_height_peak(u_t, pf_t[:, None])

    r_pts = jnp.broadcast_to(scan_quats[None], (b,) + scan_quats.shape)
    t_pts = jnp.broadcast_to(scan_trans[None], (b,) + scan_trans.shape)
    r_new = _systematic_resample(kr, u_r, r_pts, n_r)
    t_new = _systematic_resample(kt, u_t, t_pts, n_t)

    state = make_state(b, n_r, n_t, n_d)
    top_r = jnp.take_along_axis(r_pts, jnp.argmax(u_r, axis=-1)[:, None, None], axis=1)[:, 0]
    top_t = jnp.take_along_axis(t_pts, jnp.argmax(u_t, axis=-1)[:, None, None], axis=1)[:, 0]
    if mode == "2d":
        k1 = cal_vari_r_2d(r_new)
        k2, k3 = k1, k1
        min_k = jnp.asarray(1.0 / scan_quats.shape[0], real_dtype)
    else:
        k1, k2, k3, _ = cal_vari_r(r_new)
        # minimum stddev floor from the scan granularity
        # (src/Optimiser.cpp:1080-1118)
        min_k = jnp.asarray((scan_quats.shape[0]) ** (-2.0 / 3), real_dtype)
    return {
        **state,
        "r": r_new, "t": t_new, "c": cls,
        "topR": top_r, "topT": top_t,
        "k1": jnp.maximum(k1, min_k),
        "k2": jnp.maximum(k2, min_k),
        "k3": jnp.maximum(k3, min_k),
        "s0": jnp.maximum(cal_vari_t(t_new)[0], 0.3),
        "s1": jnp.maximum(cal_vari_t(t_new)[1], 0.3),
        "pfR": pf_r, "pfT": pf_t,
    }
