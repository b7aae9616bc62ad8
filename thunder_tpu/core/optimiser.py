"""The refinement driver — TPU-native counterpart of the reference Optimiser
(include/Optimiser.h:77-1183, src/Optimiser.cpp) and Model
(src/Model.cpp): config -> state -> jitted per-iteration steps -> thin host
loop. The MPI master/hemisphere topology collapses into array axes: images
carry a half-assignment (golden standard, src/Parallel.cpp:17-67), every
statistic is a batched reduction, and decisions are host scalars updated once
per iteration (no master rank).

Current scope (build plan step 3, SURVEY.md section 7): 2D/3D global-scan
E-step (phase A), sigma M-step, per-half gridding reconstruction with
Wiener-FSC, golden-standard FSC + hemisphere low-band averaging, and the
frequency-ladder / search-type state machine (T_VARI rule,
src/Model.cpp:1147-1727). The local particle-filter phase (B) plugs in via
core.particle (next build step).
"""

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Para
from ..dtypes import real_dtype
from ..geom import quat
from ..geom.symmetry import Symmetry
from ..ops import ctf as ctf_ops
from ..ops import fft as fft_ops
from ..ops import likelihood, pixels, spectrum
from ..ops.mask import soft_mask_shape
from ..ops.translate import translate_ft, translation_phase
from . import particle, projector, reconstructor, sampling

# search types (include/Optimiser.h / Model.h)
SEARCH_TYPE_GLOBAL = 0
SEARCH_TYPE_LOCAL = 1
SEARCH_TYPE_CTF = 2
SEARCH_TYPE_STOP = 3

# ladder constants (include/Model.h:47-101)
MAX_ITER_R_CHANGE_NO_DECREASE_GLOBAL = 2
MAX_ITER_R_CHANGE_NO_DECREASE_LOCAL = 0
MAX_ITER_R_CHANGE_NO_DECREASE_CTF = 0
MAX_ITER_RES_NO_IMPROVE = 2
T_VARI_DECREASE = 0.02
CUTOFF_BEYOND_RES = 0


@dataclasses.dataclass
class LadderState:
    """Frequency ladder + search type state machine (Model.cpp:1147-1727)."""

    r: int
    r_global: int
    r_init: int
    max_r: int
    search_type: int = SEARCH_TYPE_GLOBAL
    t_vari_s0: float = np.inf
    t_vari_s1: float = np.inf
    n_no_decrease: int = 0
    increase_r: bool = False
    res: int = 1
    res_top: int = 1
    n_top_res_no_improve: int = 0

    def record_t_vari(self, s0, s1):
        prev0, prev1 = self.t_vari_s0, self.t_vari_s1
        self.t_vari_s0, self.t_vari_s1 = s0, s1
        stalled = (s0 > (1 - T_VARI_DECREASE) * prev0) and (
            s1 > (1 - T_VARI_DECREASE) * prev1
        )
        if stalled:
            self.n_no_decrease += 1
        else:
            self.n_no_decrease = 0
        limit = {
            SEARCH_TYPE_GLOBAL: MAX_ITER_R_CHANGE_NO_DECREASE_GLOBAL,
            SEARCH_TYPE_LOCAL: MAX_ITER_R_CHANGE_NO_DECREASE_LOCAL,
            SEARCH_TYPE_CTF: MAX_ITER_R_CHANGE_NO_DECREASE_CTF,
        }.get(self.search_type, 10**9)
        self.increase_r = (
            self.search_type != SEARCH_TYPE_STOP and self.n_no_decrease >= limit
        )

    def elevate(self, res_shell):
        """Model::elevateR (Model.cpp:1233-1253)."""
        self.res = res_shell
        self.res_top = max(self.res_top, res_shell)
        if not self.increase_r:
            return
        if self.search_type == SEARCH_TYPE_GLOBAL:
            step = int(np.ceil((self.r_global - self.r_init) / 2))
            self.r = max(self.r, min(res_shell + 1 + CUTOFF_BEYOND_RES, self.r + step))
            self.r = min(self.r, self.r_global, self.max_r)
        else:
            cap = int(np.ceil(min(self.r * np.sqrt(1.5),
                                  self.r + (self.max_r - self.r_global) / 8)))
            self.r = max(self.r, min(res_shell + 1 + CUTOFF_BEYOND_RES, cap))
            self.r = min(self.r, self.max_r)

    def transition(self, l_search, c_search):
        """Model::searchType (Model.cpp:1417-1516)."""
        if self.search_type == SEARCH_TYPE_STOP:
            return self.search_type
        if self.search_type in (SEARCH_TYPE_LOCAL, SEARCH_TYPE_CTF):
            if self.increase_r:
                if self.res > self.res_top:
                    self.n_top_res_no_improve = 0
                else:
                    self.n_top_res_no_improve += 1
                if self.n_top_res_no_improve >= MAX_ITER_RES_NO_IMPROVE:
                    if self.search_type == SEARCH_TYPE_LOCAL and c_search:
                        self.search_type = SEARCH_TYPE_CTF
                        self._reset_counters()
                    else:
                        self.search_type = SEARCH_TYPE_STOP
        else:  # GLOBAL
            if self.increase_r and self.r >= self.r_global:
                if l_search:
                    self.search_type = SEARCH_TYPE_LOCAL
                    self._reset_counters()
                else:
                    self.search_type = SEARCH_TYPE_STOP
        return self.search_type

    def _reset_counters(self):
        self.t_vari_s0 = self.t_vari_s1 = np.inf
        self.n_no_decrease = 0
        self.n_top_res_no_improve = 0
        self.increase_r = False

    @property
    def r_u(self):
        """Reconstruction band = r + maxR/3 (Model::updateRU, :1543-1568)."""
        return min(self.r + int(round(self.max_r / 3)), self.max_r)


@partial(
    jax.jit,
    static_argnames=(
        "ctf_search", "n", "pf", "k_classes", "pixel_size",
        "perturb_d_factor", "perturb_d_on",
    ),
)
def _local_phase_step(key, st, vols, cls, dat, c_px, sig_rcp, col, row,
                      pmask, active, factor, ctf_params,
                      *, ctf_search, n, pf, k_classes, pixel_size,
                      perturb_d_factor, perturb_d_on):
    """One particle-filter phase, fully jitted: perturb -> project ->
    factored likelihood -> posterior update, with per-image active masking
    (frozen images pass through unchanged). Returns (new_state, shrank)."""
    kp, kt2, kd2, ku = jax.random.split(key, 4)

    r_new = particle.perturb_r(kp, st["r"], st["k1"], st["k2"], st["k3"],
                               pf=factor)
    t_new = particle.perturb_t(kt2, st["t"], st["s0"], st["s1"], pf=factor)
    st = {
        **st,
        "r": jnp.where(active[:, None, None], r_new, st["r"]),
        "t": jnp.where(active[:, None, None], t_new, st["t"]),
    }
    if perturb_d_on:
        d_new = particle.perturb_d(kd2, st["d"], st["sD"], pf=perturb_d_factor)
        st["d"] = jnp.where(active[:, None], d_new, st["d"])

    rots = quat.rotate3d(st["r"])  # (B, mLR, 3, 3)
    coords = projector.slice_coords_3d(rots, col, row, pf=pf)
    if k_classes == 1:
        proj = projector.project_brick_3d(vols[0], rots, col, row, pf=pf)
    else:
        # gather each image's slice from ITS class's brick table: index the
        # stacked tables by class on the fly (one fused gather, no K-fold
        # projection + select of round 1, src/Optimiser.cpp:925-955)
        from ..ops import brick as brick_ops

        mc = vols.shape[-2]
        flat = vols.reshape(k_classes * mc**3, 16)
        idx, w8, valid = brick_ops._corners3(coords, mc)
        idx = jnp.where(valid, idx, 0) + (cls * mc**3)[:, None, None]
        rows = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (16,))
        re = jnp.sum(rows[..., :8] * w8, -1)
        im = jnp.sum(rows[..., 8:] * w8, -1)
        proj = jnp.where(valid, jax.lax.complex(re, im), 0.0)
    tra = translation_phase(col, row, st["t"][..., 0], st["t"][..., 1], n)
    ctf_d = None
    if ctf_search:
        ctf_d = ctf_ops.ctf_pixels(
            col, row, n, pixel_size,
            ctf_params["voltage"][:, None], ctf_params["defocus_u"][:, None],
            ctf_params["defocus_v"][:, None],
            ctf_params["defocus_theta"][:, None],
            ctf_params["cs"][:, None], ctf_params["amp_contrast"][:, None],
            ctf_params.get(
                "phase_shift", jnp.zeros_like(ctf_params["voltage"])
            )[:, None],
            defocus_factor=st["d"],
        )
    u_r, u_t, u_d = likelihood.local_search_weights(
        dat, c_px, sig_rcp, proj, tra, st["wR"], st["wT"], st["wD"],
        ctf_d=ctf_d, pixel_mask=pmask,
    )
    new_st = particle.update_from_likelihood(
        st, ku, u_r, u_t, u_d,
        peak_factor_r=particle.PEAK_FACTOR_MIN,
        with_d=ctf_search,
    )
    prev_vari = {k: st[k] for k in ("k1", "k2", "k3", "s0", "s1", "sD")}
    out = {
        k: jnp.where(active.reshape((-1,) + (1,) * (v.ndim - 1)), v, st[k])
        for k, v in new_st.items()
    }
    shrank = particle.vari_shrank(out, prev_vari)
    return out, shrank


class Optimiser:
    """Single-host driver. Data arrives either from para.db (a .thu file +
    MRC stacks) or as in-memory arrays via ``set_data``."""

    def __init__(self, para: Para):
        self.para = para
        self.sym = Symmetry(para.sym)
        self.n = para.size
        self.key = jax.random.PRNGKey(para.seed)
        self.iteration = 0
        self.history = []

        n, ps = para.size, para.pixel_size
        a2p = lambda res_a: max(1, int(round(n * ps / res_a)))
        self.max_r = n // 2 - int(np.ceil(para.a))
        self.ladder = LadderState(
            r=min(a2p(para.init_res), self.max_r),
            r_global=min(a2p(para.global_search_res), self.max_r),
            r_init=min(a2p(para.init_res), self.max_r),
            max_r=self.max_r,
            search_type=SEARCH_TYPE_GLOBAL if para.g_search else SEARCH_TYPE_LOCAL,
        )
        self.r_low = max(
            1, int(round(n * ps / para.ignore_res)) if para.ignore_res > 0 else 1
        )

    # ------------------------------------------------------------------ data

    def set_data(self, imgs, ctf_params, group_ids=None, halves=None):
        """imgs: (N, n, n) float32 real-space particle images (object at
        center); ctf_params: dict with voltage/defocus_u/defocus_v/
        defocus_theta/cs/amp_contrast/phase_shift arrays (N,)."""
        imgs = np.asarray(imgs, dtype=np.float32)
        self.n_imgs = imgs.shape[0]
        self.ctf_params = {k: jnp.asarray(v, dtype=real_dtype)
                           for k, v in ctf_params.items()}
        self.group_ids = (
            np.zeros(self.n_imgs, np.int32) if group_ids is None
            else np.asarray(group_ids, np.int32)
        )
        self.n_groups = int(self.group_ids.max()) + 1
        if halves is None:
            # shuffled half split (Database::shuffle/split semantics)
            perm = np.random.default_rng(self.para.seed).permutation(self.n_imgs)
            halves = np.zeros(self.n_imgs, np.int32)
            halves[perm[self.n_imgs // 2:]] = 1
        self.halves = np.asarray(halves, np.int32)

        # _imgOri / _img of the reference: background-normalised spectra,
        # unmasked and masked (include/Optimiser.h _img/_imgOri)
        imgs_norm, alpha = self._preprocess(jnp.asarray(imgs))
        self.imgs_ft_ori = fft_ops.fft2_center(imgs_norm)
        if self.para.zero_mask:
            self.imgs_ft = fft_ops.fft2_center(imgs_norm * alpha)
        else:
            self.imgs_ft = self.imgs_ft_ori
        # per-image accumulated re-centring offsets (Optimiser::_offset)
        self.offsets = np.zeros((self.n_imgs, 2), np.float32)
        # per-group intensity scale (Optimiser::_scale)
        self.scale = np.ones(self.n_groups, np.float32)
        # pose estimates per image
        self.best_class = np.zeros(self.n_imgs, np.int32)
        self.best_quat = np.tile(np.array([1.0, 0, 0, 0], np.float32),
                                 (self.n_imgs, 1))
        self.best_trans = np.zeros((self.n_imgs, 2), np.float32)
        self.best_phi = np.zeros(self.n_imgs, np.float32)  # 2D mode
        self.best_defocus = np.ones(self.n_imgs, np.float32)
        self.scores = np.ones(self.n_imgs, np.float32)
        # the particle filter state over ALL images (persists across
        # iterations, like the reference's _par vector)
        self.par = particle.make_state(
            self.n_imgs, self.para.m_l_r, self.para.m_l_t, self.para.m_l_d
        )

    def load_poses(self, quats, trans, defocus=None, classes=None,
                   k123=None, std_t=None):
        """Resume support: rebuild the particle filter from stored .thu pose
        columns (Particle::load semantics, src/Optimiser.cpp:5312-5385 via
        loadParticles) — support points cluster around the stored pose with
        the stored concentrations/stddevs."""
        b = self.n_imgs
        q = jnp.asarray(quats, real_dtype)
        t = jnp.asarray(trans, real_dtype)
        self.best_quat = np.asarray(quats, np.float32)
        self.best_trans = np.asarray(trans, np.float32)
        if classes is not None:
            self.best_class = np.asarray(classes, np.int32)
        if defocus is not None:
            self.best_defocus = np.asarray(defocus, np.float32)
        k1 = (jnp.asarray(k123[0], real_dtype) if k123 is not None
              else jnp.full((b,), 0.01, real_dtype))
        k2 = (jnp.asarray(k123[1], real_dtype) if k123 is not None
              else jnp.full((b,), 0.01, real_dtype))
        k3 = (jnp.asarray(k123[2], real_dtype) if k123 is not None
              else jnp.full((b,), 0.01, real_dtype))
        s0 = (jnp.asarray(std_t[0], real_dtype) if std_t is not None
              else jnp.ones((b,), real_dtype))
        s1 = (jnp.asarray(std_t[1], real_dtype) if std_t is not None
              else jnp.ones((b,), real_dtype))
        n_r = self.par["r"].shape[1]
        n_t = self.par["t"].shape[1]
        self.par["r"] = jnp.broadcast_to(q[:, None, :], (b, n_r, 4))
        self.par["t"] = jnp.broadcast_to(t[:, None, :], (b, n_t, 2))
        self.par["topR"] = q
        self.par["topT"] = t
        self.par["k1"] = jnp.maximum(k1, 1e-5)
        self.par["k2"] = jnp.maximum(k2, 1e-5)
        self.par["k3"] = jnp.maximum(k3, 1e-5)
        self.par["s0"] = jnp.maximum(s0, 0.1)
        self.par["s1"] = jnp.maximum(s1, 0.1)
        if defocus is not None:
            n_d = self.par["d"].shape[1]
            self.par["d"] = jnp.broadcast_to(
                jnp.asarray(defocus, real_dtype)[:, None], (b, n_d))
            self.par["topD"] = jnp.asarray(defocus, real_dtype)

    def _preprocess(self, imgs):
        """statImg + substractBgImg + normaliseImg
        (src/Optimiser.cpp:4608-4720): background ring stats -> zero-mean,
        unit-std background. Returns (normalised images, soft mask alpha);
        the caller applies the mask for the _img stack (maskImg)."""
        n = self.n
        r_mask = self.para.mask_radius_px
        ew = 6.0  # EDGE_WIDTH_RL (include/Macro.h)
        alpha = soft_mask_shape((n, n), r_mask, ew)
        bg_w = 1.0 - alpha
        denom = jnp.maximum(jnp.sum(bg_w), 1.0)
        mean = jnp.sum(imgs * bg_w, axis=(-2, -1), keepdims=True) / denom
        var = jnp.sum(((imgs - mean) ** 2) * bg_w, axis=(-2, -1), keepdims=True) / denom
        imgs = (imgs - mean) / jnp.sqrt(jnp.maximum(var, 1e-12))
        return imgs, alpha

    def init_reference(self, vol=None):
        """Initial model: provided volume (n^3) or a soft sphere; low-passed
        to the initial resolution; replicated to both hemispheres and all
        classes."""
        n, k = self.n, self.para.k
        if vol is None:
            vol = np.asarray(soft_mask_shape((n, n, n), n / 8, n / 8))
        vol = jnp.asarray(vol, dtype=real_dtype)
        ft = fft_ops.fft3_center(vol)
        thres = self.ladder.r / n
        from ..ops.filters import low_pass_filter

        ft = low_pass_filter(ft, thres, 3.0 / n, 3)
        vol = fft_ops.ifft3_center(ft).real
        # refs[half][class] — start identical
        self.refs = jnp.tile(vol[None, None], (2, k, 1, 1, 1))

    # ------------------------------------------------------------ init sigma

    def init_sigma(self):
        """Initial per-group noise spectra from average image power
        (src/Optimiser.cpp:568, initSigma): sig = shell power / 2."""
        n = self.n
        ps = spectrum.power_spectrum(self.imgs_ft, n // 2, 2)  # (N, shells)
        sig = np.zeros((self.n_groups, n // 2), np.float32)
        for g in range(self.n_groups):
            sel = self.group_ids == g
            sig[g] = np.asarray(jnp.mean(ps[sel], axis=0)) / 2
        self.sig = jnp.asarray(np.maximum(sig, 1e-10))

    # ------------------------------------------------------------ expectation

    def _ring(self):
        return pixels.pixel_ring(self.n, self.r_low, self.ladder.r)

    def _gather_ring_data(self, ring, idx, ori=False):
        """Observed pixels, CTF and sigma reciprocal on the ring for a subset
        of images. ``ori=True`` reads the unmasked stack (_imgOri)."""
        stack = self.imgs_ft_ori if ori else self.imgs_ft
        dat = pixels.gather_pixels(stack[idx], ring)
        col = jnp.asarray(ring.col)
        row = jnp.asarray(ring.row)
        cp = {k: v[idx] for k, v in self.ctf_params.items()}
        c = ctf_ops.ctf_pixels(
            col, row, self.n, self.para.pixel_size,
            cp["voltage"], cp["defocus_u"], cp["defocus_v"],
            cp["defocus_theta"], cp["cs"], cp["amp_contrast"],
            cp.get("phase_shift", jnp.zeros_like(cp["voltage"])),
        )
        sig_px = self.sig[self.group_ids[idx][:, None], jnp.asarray(ring.sig)[None, :]]
        sig_rcp = likelihood.sigma_reciprocal(sig_px)
        return dat, c, sig_rcp

    def expectation(self):
        """E-step: global scan (phase A, GLOBAL search only) seeding the
        particle filter, then the phase-B local refinement. Returns the
        average translation posterior stddevs for the ladder."""
        if self.ladder.search_type == SEARCH_TYPE_GLOBAL:
            self.global_scan()
        return self.local_search()

    def global_scan(self):
        """Phase A: dense pose scan for every image, per hemisphere."""
        para = self.para
        ring = self._ring()
        col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
        pmask = jnp.asarray(ring.mask)

        n_r = sampling.n_scan_rotations(para.m_s, self.sym.n_elements, para.mode)
        n_t = sampling.n_scan_translations(para.trans_s, para.trans_search_factor)
        self.key, kr, kt = jax.random.split(self.key, 3)
        if para.mode == "2d":
            phis = sampling.sample_rotations_2d(kr, n_r)
            rots2 = quat.rotate2d(phis)
            quats = jnp.stack(
                [jnp.cos(phis / 2), jnp.zeros_like(phis), jnp.zeros_like(phis),
                 jnp.sin(phis / 2)], axis=-1,
            )
        else:
            quats = sampling.sample_rotations_3d(
                kr, n_r, self.sym.quat if self.sym.n_elements else None
            )
            rots3 = quat.rotate3d(quats)
        trans = sampling.sample_translations(kt, n_t, para.trans_s)
        tra = translation_phase(col, row, trans[:, 0], trans[:, 1], self.n)

        for h in (0, 1):
            idx = np.nonzero(self.halves == h)[0]
            if len(idx) == 0:
                continue
            # class projections from this hemisphere's reference
            r_band = self.ladder.r
            projs = []
            for k in range(para.k):
                if para.mode == "2d":
                    tab = projector.build_brick_projectee_2d(
                        self.refs[h, k, self.n // 2], r_band, pf=para.pf
                    )
                    projs.append(projector.project_brick_2d(
                        tab, rots2, col, row, pf=para.pf))
                else:
                    tab = projector.build_brick_projectee_3d(
                        self.refs[h, k], r_band, pf=para.pf
                    )
                    projs.append(projector.project_brick_3d(
                        tab, rots3, col, row, pf=para.pf))
            proj = jnp.stack(projs)  # (K, R, P)

            batch = para.image_batch or len(idx)
            for s in range(0, len(idx), batch):
                sub = idx[s : s + batch]
                dat, c, sig_rcp = self._gather_ring_data(ring, sub)
                out = likelihood.global_search_weights(
                    dat, c, sig_rcp, proj, tra, pixel_mask=pmask
                )
                wc = np.asarray(out["wC"])
                wr = np.asarray(out["wR"])
                wt = np.asarray(out["wT"])
                # class posterior: peak-clip + argmax (reference resamples
                # the class; argmax is its K-small limit)
                cls = np.argmax(wc, axis=1)
                self.best_class[sub] = cls
                # seed the per-image particle filter from the scan marginals
                self.key, kinit = jax.random.split(self.key)
                sub_j = jnp.asarray(sub)
                st = particle.init_from_scan(
                    kinit,
                    jnp.asarray(wr[np.arange(len(sub)), cls]),
                    jnp.asarray(wt[np.arange(len(sub)), cls]),
                    quats, trans, para.m_l_r, para.m_l_t, para.m_l_d,
                    peak_factor_r=0.0, peak_factor_t=0.0,
                )
                for field in self.par:
                    self.par[field] = self.par[field].at[sub_j].set(st[field])

    def _class_projectees(self, h, r_band=None):
        para = self.para
        r_band = self.ladder.r if r_band is None else r_band
        vols = []
        for k in range(para.k):
            vols.append(projector.build_brick_projectee_3d(
                self.refs[h, k], r_band, pf=para.pf))
        return jnp.stack(vols)  # (K, mc, mc, mc, 16)

    def local_search(self):
        """Phase-B particle-filter refinement for every image
        (src/Optimiser.cpp:1138-1660): perturb -> evaluate -> update until
        the per-image variances stop shrinking."""
        para = self.para
        ring = self._ring()
        col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
        pmask = jnp.asarray(ring.mask)
        st_type = self.ladder.search_type
        min_phase = (particle.MIN_N_PHASE_PER_ITER_GLOBAL
                     if st_type == SEARCH_TYPE_GLOBAL
                     else particle.MIN_N_PHASE_PER_ITER_LOCAL)
        perturb_s = (para.perturb_factor_s_global
                     if st_type == SEARCH_TYPE_GLOBAL
                     else para.perturb_factor_s_local)
        ctf_search = st_type == SEARCH_TYPE_CTF

        t_vari = []
        for h in (0, 1):
            idx = np.nonzero(self.halves == h)[0]
            if len(idx) == 0:
                continue
            vols = self._class_projectees(h)
            dat, c_px, sig_rcp = self._gather_ring_data(ring, idx)
            sub_j = jnp.asarray(idx)
            st = {k: v[sub_j] for k, v in self.par.items()}
            cls = jnp.asarray(self.best_class[idx])

            cp_sub = {k: v[sub_j] for k, v in self.ctf_params.items()}
            done = np.zeros(len(idx), bool)
            no_dec = np.zeros(len(idx), np.int32)
            for phase in range(particle.MAX_N_PHASE_PER_ITER):
                self.key, kphase = jax.random.split(self.key)
                factor = para.perturb_factor_l if phase == 0 else perturb_s
                st, shrank = _local_phase_step(
                    kphase, st, vols, cls, dat, c_px, sig_rcp, col, row,
                    pmask, jnp.asarray(~done), jnp.asarray(factor, real_dtype),
                    cp_sub,
                    ctf_search=ctf_search, n=self.n, pf=para.pf,
                    k_classes=para.k, pixel_size=para.pixel_size,
                    perturb_d_factor=para.perturb_factor_s_ctf,
                    perturb_d_on=ctf_search and phase > 0,
                )
                if phase >= min_phase:
                    shrank_np = np.asarray(shrank)
                    no_dec = np.where(shrank_np, 0, no_dec + 1)
                    done |= no_dec >= particle.N_PHASE_WITH_NO_VARI_DECREASE
                    if done.all():
                        break

            for field in self.par:
                self.par[field] = self.par[field].at[sub_j].set(st[field])
            self.best_quat[idx] = np.asarray(st["topR"])
            self.best_trans[idx] = np.asarray(st["topT"])
            self.best_defocus[idx] = np.asarray(st["topD"])
            self.scores[idx] = np.asarray(particle.compress_r(st))
            t_vari.append(np.stack(
                [np.asarray(st["s0"]), np.asarray(st["s1"])], axis=-1))
        tv = np.concatenate(t_vari, axis=0).mean(axis=0)
        return float(tv[0]), float(tv[1])


    # ---------------------------------------------------------- maximization

    def _rot_matrices(self, idx):
        if self.para.mode == "2d":
            return quat.rotate2d(jnp.asarray(self.best_phi[idx]))
        return quat.rotate3d(jnp.asarray(self.best_quat[idx]))

    def _predicted_slices(self, ring, idx, h, use_offset=False):
        """CTF-free predicted (translated) slices at the current best pose.
        ``use_offset`` projects at (tran - offset) — pairs with the UNMASKED
        image stack, which is never re-centred (the reference's
        OPTIMISER_RECENTRE_IMAGE_EACH_ITERATION convention)."""
        col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
        rots = self._rot_matrices(idx)
        r_band = int(np.ceil(ring.r_high))
        pri = []
        for k in range(self.para.k):
            if self.para.mode == "2d":
                tab = projector.build_brick_projectee_2d(
                    self.refs[h, k, self.n // 2], r_band, pf=self.para.pf)
                pri.append(projector.project_brick_2d(tab, rots, col, row,
                                                      pf=self.para.pf))
            else:
                tab = projector.build_brick_projectee_3d(
                    self.refs[h, k], r_band, pf=self.para.pf)
                pri.append(projector.project_brick_3d(tab, rots, col, row,
                                                      pf=self.para.pf))
        pri = jnp.stack(pri)  # (K, B, P)
        pri = pri[self.best_class[idx], jnp.arange(len(idx))]
        t = np.array(self.best_trans[idx])
        if use_offset:
            t = t - self.offsets[idx]
        t = jnp.asarray(t)
        tra = translation_phase(col, row, t[:, 0], t[:, 1], self.n)
        return pri * tra

    def maximization_sigma(self):
        """allReduceSigma, unmasked path (src/Optimiser.cpp:6397-6710,
        OPTIMISER_SIGMA_MASK off): sig(group, shell) =
        mean_l power_shell(datOri - ctf * pri(tran - offset)) / 2."""
        ring = self._ring()
        n_shell = self.n // 2
        acc = np.zeros((self.n_groups, n_shell), np.float64)
        cnt = np.zeros((self.n_groups, 1), np.float64)
        shell_n = np.zeros(n_shell, np.float64)
        np.add.at(shell_n, np.asarray(ring.sig)[np.asarray(ring.mask) > 0], 1)
        for h in (0, 1):
            idx = np.nonzero(self.halves == h)[0]
            if len(idx) == 0:
                continue
            dat, c, _ = self._gather_ring_data(ring, idx, ori=True)
            pri = self._predicted_slices(ring, idx, h, use_offset=True)
            resid = jnp.abs(dat - c * pri) ** 2 * jnp.asarray(ring.mask)
            # per-shell sums
            sig_idx = np.asarray(ring.sig)
            shell_sum = np.zeros((len(idx), n_shell), np.float64)
            np.add.at(shell_sum.T, sig_idx, np.asarray(resid, np.float64).T)
            shell_mean = shell_sum / np.maximum(shell_n, 1.0)
            for g in range(self.n_groups):
                sel = self.group_ids[idx] == g
                if sel.any():
                    acc[g] += shell_mean[sel].sum(axis=0) / 2
                    cnt[g] += sel.sum()
        sig = acc / np.maximum(cnt, 1.0)
        # only update the re-estimated band [0, r); keep tail at last value
        r = self.ladder.r
        new_sig = np.asarray(self.sig).copy()
        new_sig[:, :r] = np.maximum(sig[:, :r], 1e-10)
        new_sig[:, r:] = new_sig[:, r - 1 : r]
        self.sig = jnp.asarray(new_sig)

    # -------------------------------------------------- parity corrections

    def _r_s(self):
        """Scale-correction frequency band (Optimiser::refreshScale,
        src/Optimiser.cpp:5749-5766): resolution at thresSclCorFSC after the
        first round, the configured sclCorRes band before, clamped to r."""
        para = self.para
        if self.iteration > 0 and hasattr(self, "fsc"):
            r_s = int(spectrum.res_p(jnp.asarray(self.fsc[0]),
                                     para.thres_scl_cor_fsc, r_low=1))
        else:
            r_s = max(1, int(round(self.n * para.pixel_size / para.scl_cor_res)))
        return min(r_s, self.ladder.r)

    def refresh_scale(self, group=True):
        """Per-group intensity scale from a data-vs-projection linear fit
        (Optimiser::refreshScale src/Optimiser.cpp:5749-6063,
        scaleDataVSPrior :10286): scale_g = sum XA / sum AA over shells in
        [rL, rS), XA = Re(dat conj(ctf pri)), AA = |ctf pri|^2, clamped to
        [median/5, median*5]."""
        ring = pixels.pixel_ring(self.n, self.r_low, self._r_s())
        xa = np.zeros(self.n_groups, np.float64)
        aa = np.zeros(self.n_groups, np.float64)
        for h in (0, 1):
            idx = np.nonzero(self.halves == h)[0]
            if len(idx) == 0:
                continue
            dat, c, _ = self._gather_ring_data(ring, idx, ori=True)
            pri = self._predicted_slices(ring, idx, h, use_offset=True)
            cp = c * pri * jnp.asarray(ring.mask)
            xa_l = np.asarray(jnp.sum((jnp.conj(dat) * cp).real, axis=-1),
                              np.float64)
            aa_l = np.asarray(jnp.sum(jnp.abs(cp) ** 2, axis=-1), np.float64)
            g = self.group_ids[idx] if group else np.zeros(len(idx), np.int32)
            np.add.at(xa, g, xa_l)
            np.add.at(aa, g, aa_l)
        if not group:
            xa[:] = xa[0]
            aa[:] = aa[0]
        scale = np.abs(xa / np.maximum(aa, 1e-30))
        med = np.median(scale)
        scale = np.clip(scale, med / 5, med * 5)
        return scale.astype(np.float32)

    def correct_scale(self, init=False, group=True):
        """Apply the refreshed scale (Optimiser::correctScale,
        src/Optimiser.cpp:5103-5144): at init multiply the reference by the
        scale; afterwards divide the image stacks by their group scale and
        sigma by scale^2."""
        scale = self.refresh_scale(group=group)
        if init:
            s = float(scale[self.group_ids[0]])
            self.refs = self.refs * s
        else:
            s_img = jnp.asarray(scale)[self.group_ids][:, None, None]
            self.imgs_ft = self.imgs_ft / s_img
            self.imgs_ft_ori = self.imgs_ft_ori / s_img
            self.sig = self.sig / jnp.asarray(scale[:, None] ** 2)
        self.scale = scale

    def norm_correction(self):
        """Optimiser::normCorrection (src/Optimiser.cpp:6201-6394,
        OPTIMISER_NORM_MASK on): per-image residual power over [rL, rNorm)
        on the MASKED stack at the rank-1 pose; rescale both stacks by
        sqrt(median / norm_l)."""
        r_norm = min(
            self.ladder.r,
            int(spectrum.res_p(jnp.asarray(self.fsc[0]), 0.75, r_low=1))
            if hasattr(self, "fsc") else self.ladder.r,
        )
        ring = pixels.pixel_ring(self.n, self.r_low, max(r_norm, self.r_low + 1))
        norm = np.zeros(self.n_imgs, np.float64)
        for h in (0, 1):
            idx = np.nonzero(self.halves == h)[0]
            if len(idx) == 0:
                continue
            dat, c, _ = self._gather_ring_data(ring, idx)
            pri = self._predicted_slices(ring, idx, h)
            resid = jnp.abs(dat - c * pri) ** 2 * jnp.asarray(ring.mask)
            norm[idx] = np.asarray(jnp.sum(resid, axis=-1), np.float64)
        m = np.median(norm)
        fac = jnp.asarray(np.sqrt(m / np.maximum(norm, 1e-30)).astype(np.float32))
        self.imgs_ft = self.imgs_ft * fac[:, None, None]
        self.imgs_ft_ori = self.imgs_ft_ori * fac[:, None, None]

    def re_centre_img(self):
        """Optimiser::reCentreImg (src/Optimiser.cpp:6065-6093): fold each
        image's rank-1 translation into its accumulated offset, re-derive the
        masked stack from the (never-moved) original stack, and shift the
        particle filter's translation support accordingly."""
        tran = np.array(self.best_trans)
        self.offsets -= tran
        t_shift = jnp.asarray(tran)
        # shift support points and tracked poses
        self.par["t"] = self.par["t"] - t_shift[:, None, :]
        self.par["topT"] = self.par["topT"] - t_shift
        self.best_trans = np.zeros_like(self.best_trans)
        self._rebuild_masked_stack()

    def _rebuild_masked_stack(self):
        """_img = mask(translate(_imgOri, offset)) (reCentreImg + reMaskImg,
        src/Optimiser.cpp:6065-6153)."""
        off = jnp.asarray(self.offsets)
        shifted = translate_ft(self.imgs_ft_ori, off[:, 0], off[:, 1])
        if self.para.zero_mask:
            n = self.n
            alpha = soft_mask_shape((n, n), self.para.mask_radius_px, 6.0)
            rl = fft_ops.ifft2_center(shifted).real * alpha
            self.imgs_ft = fft_ops.fft2_center(rl)
        else:
            self.imgs_ft = shifted

    def re_mask_img(self):
        """Optimiser::reMaskImg (src/Optimiser.cpp:6093-6153): re-apply the
        zero-noise soft mask to the working stack."""
        if not self.para.zero_mask:
            return
        n = self.n
        alpha = soft_mask_shape((n, n), self.para.mask_radius_px, 6.0)
        rl = fft_ops.ifft2_center(self.imgs_ft).real * alpha
        self.imgs_ft = fft_ops.fft2_center(rl)

    def solvent_flatten(self, use_mask=False):
        """Optimiser::solventFlatten (src/Optimiser.cpp:7768-7990, active
        OPTIMISER_SOLVENT_FLATTEN_MASK_ZERO path): soft-mask every reference
        with zero background — the spherical mask by default, the provided
        mask volume (low-passed to the current band) when enabled."""
        n = self.n
        if use_mask and getattr(self, "mask_vol", None) is not None:
            m_ft = fft_ops.fft3_center(jnp.asarray(self.mask_vol, real_dtype))
            from ..ops.filters import low_pass_filter

            m_ft = low_pass_filter(m_ft, self.ladder.r / n, 4.0 / n, 3)
            alpha = jnp.clip(fft_ops.ifft3_center(m_ft).real, 0.0, 1.0)
        elif self.para.mode == "2d":
            alpha = soft_mask_shape((n, n), self.para.mask_radius_px, 6.0)
        else:
            alpha = soft_mask_shape((n, n, n), self.para.mask_radius_px, 6.0)
        if self.para.mode == "2d":
            # refs hold the central slice convention: mask each 2D class
            self.refs = self.refs.at[:, :, self.n // 2].multiply(alpha)
        else:
            self.refs = self.refs * alpha

    def refresh_class_distr(self):
        """Class fractions (Optimiser::refreshClassDistr,
        src/Optimiser.cpp:5484-5517)."""
        counts = np.bincount(self.best_class, minlength=self.para.k)
        self.c_distr = counts / max(counts.sum(), 1)
        return self.c_distr

    def balance_class(self, thres=0.05):
        """OPTIMISER_BALANCE_CLASS during global search
        (determineBalanceClass/balanceClass, src/Optimiser.cpp:5519-5593,
        CLASS_BALANCE_FACTOR include/Optimiser.h:71): a class holding fewer
        than thres/K of the images gets its reference resigned from a class
        drawn proportionally to the excess distribution."""
        if self.para.k == 1:
            return
        distr = self.refresh_class_distr()
        rng = np.random.default_rng(self.para.seed + self.iteration)
        excess = np.where(distr < thres / self.para.k, 0.0,
                          distr - thres / self.para.k)
        if excess.sum() <= 0:
            return
        p_src = excess / excess.sum()
        for t in range(self.para.k):
            if distr[t] < thres / self.para.k:
                j = int(rng.choice(self.para.k, p=p_src))
                self.refs = self.refs.at[:, t].set(self.refs[:, j])

    def _golden_fsc(self, ft_a, ft_b):
        """Golden-standard FSC between half-map spectra, with the
        mask/core random-phase correction when enabled
        (Model::compareTwoHemispheres src/Model.cpp:407-546): FSC the raw
        maps; randomize phases past the FSC=0.8 shell; soft-mask both the
        randomized and the raw maps (provided mask for maskFSC, spherical
        core of the image mask radius for coreFSC); true FSC =
        (FSC_mask - FSC_rand) / (1 - FSC_rand) past that shell."""
        para = self.para
        n = self.n
        fsc_u = spectrum.frc_fsc(ft_a, ft_b, n // 2, 3)
        use_mask = para.mask_fsc and getattr(self, "mask_vol", None) is not None
        use_core = para.core_fsc and para.mode == "3d"
        if not (use_mask or use_core) or para.mode != "3d":
            return fsc_u

        if use_mask:
            alpha = jnp.asarray(self.mask_vol, real_dtype)
        else:
            alpha = soft_mask_shape((n, n, n), self.para.mask_radius_px, 6.0)
        r_rand = int(spectrum.res_p(fsc_u, 0.8, r_low=1))
        self.key, ka, kb = jax.random.split(self.key, 3)
        ra = fft_ops.ifft3_center(
            spectrum.random_phase(ka, ft_a, r_rand, 3)).real * alpha
        rb = fft_ops.ifft3_center(
            spectrum.random_phase(kb, ft_b, r_rand, 3)).real * alpha
        fsc_r = spectrum.frc_fsc(
            fft_ops.fft3_center(ra), fft_ops.fft3_center(rb), n // 2, 3)
        ma = fft_ops.ifft3_center(ft_a).real * alpha
        mb = fft_ops.ifft3_center(ft_b).real * alpha
        fsc_m = spectrum.frc_fsc(
            fft_ops.fft3_center(ma), fft_ops.fft3_center(mb), n // 2, 3)
        shells = jnp.arange(n // 2)
        corrected = (fsc_m - fsc_r) / jnp.maximum(1 - fsc_r, 1e-6)
        return jnp.where(shells < r_rand + 2, fsc_m, corrected)

    def set_mask(self, vol):
        """Provided reference mask volume (n, n, n) in [0, 1]."""
        self.mask_vol = np.asarray(vol, np.float32)

    def reconstruct(self):
        """Per-half, per-class insert + reconstruct; golden-standard FSC;
        average hemispheres below the high-fidelity band
        (Model::compareTwoHemispheres, src/Model.cpp:307-850)."""
        para = self.para
        r_u = self.ladder.r_u
        ring = pixels.pixel_ring(self.n, 0, r_u)
        col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
        pmask = jnp.asarray(ring.mask)

        new_refs = []
        fscs = []
        half_maps = []
        for k in range(para.k):
            maps = []
            for h in (0, 1):
                idx = np.nonzero((self.halves == h) & (self.best_class == k))[0]
                state = reconstructor.empty_brick_state(
                    self.n, r_u, pf=para.pf,
                    mode="3d" if para.mode == "3d" else "2d",
                )
                if len(idx):
                    dat, c, _ = self._gather_ring_data(ring, idx)
                    sub_j = jnp.asarray(idx)
                    # insert m_reco poses drawn from each image's particle
                    # filter (Optimiser::reconstructRef draws mReco support
                    # points, src/Optimiser.cpp:6711+), weighted by the
                    # particle grade when enabled (parGra / compressR)
                    n_draw = min(para.m_reco, para.m_l_r)
                    w_img = (jnp.asarray(self.scores[idx])
                             if para.par_gra else jnp.ones(len(idx)))
                    w_img = w_img / n_draw
                    par_r = self.par["r"][sub_j]      # (B, mLR, 4)
                    par_t = self.par["t"][sub_j]      # (B, mLT, 2)
                    n_t_sup = par_t.shape[1]
                    b_img = len(idx)
                    self.key, kd = jax.random.split(self.key)
                    # support points post-resample are uniform-weighted:
                    # a uniform index draw IS a posterior draw
                    ri = jax.random.randint(kd, (b_img, n_draw), 0, par_r.shape[1])
                    ti = jax.random.randint(
                        jax.random.fold_in(kd, 1), (b_img, n_draw), 0, n_t_sup)
                    q_d = jnp.take_along_axis(par_r, ri[..., None], axis=1)
                    t_d = jnp.take_along_axis(par_t, ti[..., None], axis=1)
                    rots_all = quat.rotate3d(q_d).reshape(b_img * n_draw, 3, 3)
                    # flatten draws into the batch axis and chunk-insert
                    bs = 256
                    for s in range(0, b_img * n_draw, bs):
                        img_i = jnp.arange(s, min(s + bs, b_img * n_draw)) // n_draw
                        sl = slice(s, min(s + bs, b_img * n_draw))
                        t_sl = t_d.reshape(b_img * n_draw, 2)[sl]
                        tra = translation_phase(
                            col, row, -t_sl[:, 0], -t_sl[:, 1], self.n)
                        state = reconstructor.insert_brick_3d(
                            state, dat[img_i] * tra, c[img_i], rots_all[sl],
                            col, row, w_img[img_i], pf=para.pf,
                            pixel_mask=pmask,
                        )
                f_c, t_c = reconstructor.finalize_brick(state)
                if self.sym.n_elements:
                    f_c, t_c = reconstructor.symmetrize_cropped(
                        f_c, t_c, jnp.asarray(self.sym.rot.astype(np.float32)),
                        r_u, pf=para.pf,
                    )
                maps.append((f_c, t_c))
            # golden-standard FSC between the two raw half-F's is computed
            # from reconstructed maps below
            prev_fsc = getattr(self, "fsc", None)
            fsc_k = (jnp.ones((self.n // 2,)) if prev_fsc is None
                     else jnp.asarray(prev_fsc[k]))
            vols = [
                reconstructor.reconstruct_cropped(
                    f_c, t_c, fsc_k, self.n, pf=para.pf,
                    max_radius=r_u, join_half=False,
                )
                for (f_c, t_c) in maps
            ]
            ft_a, ft_b = fft_ops.fft3_center(vols[0]), fft_ops.fft3_center(vols[1])
            fsc_new = self._golden_fsc(ft_a, ft_b)
            fscs.append(np.asarray(fsc_new))
            half_maps.append([np.asarray(v) for v in vols])
            # hemisphere averaging below the band where FSC >= 0.95 thres
            band = int(spectrum.res_p(fsc_new, 0.95, r_low=1))
            u = jnp.rint(fft_ops.radius_grid_3d(self.n)).astype(jnp.int32)
            avg = (ft_a + ft_b) / 2
            ft_a2 = jnp.where(u <= band, avg, ft_a)
            ft_b2 = jnp.where(u <= band, avg, ft_b)
            new_refs.append(jnp.stack([
                fft_ops.ifft3_center(ft_a2).real,
                fft_ops.ifft3_center(ft_b2).real,
            ]))
        self.fsc = np.stack(fscs)  # (K, shells)
        self.half_maps = half_maps
        refs = jnp.stack(new_refs, axis=1)  # (2, K, n, n, n)
        self.refs = refs

    # ------------------------------------------------------------------ run

    def run_iteration(self):
        """One refinement round in the reference's order
        (Optimiser::run src/Optimiser.cpp:3561-4075 + maximization :3405)."""
        para = self.para
        search_type_in = self.ladder.search_type
        if not para.skip_e:
            tv0, tv1 = self.expectation()
        else:
            tv0, tv1 = self.ladder.t_vari_s0, self.ladder.t_vari_s1
        self.ladder.record_t_vari(tv0, tv1)

        # --- maximization (src/Optimiser.cpp:3405-3520)
        if not para.skip_m:
            if self.iteration != 0 and search_type_in != SEARCH_TYPE_GLOBAL:
                self.norm_correction()
            self.maximization_sigma()
            if (search_type_in == SEARCH_TYPE_GLOBAL and para.group_scl
                    and self.iteration != 0):
                self.correct_scale(init=False, group=True)
        if not para.skip_r:
            self.reconstruct()
            if search_type_in == SEARCH_TYPE_GLOBAL:
                self.balance_class()

        # --- re-centre + re-mask each iteration (:3789-3875)
        if search_type_in != SEARCH_TYPE_GLOBAL and para.mode == "3d":
            self.re_centre_img()
            self.re_mask_img()

        # --- solvent flatten (:4005-4014): provided mask only after global
        # search unless global_mask is set
        if not para.skip_r:
            if search_type_in == SEARCH_TYPE_GLOBAL and not para.global_mask:
                self.solvent_flatten(False)
            else:
                self.solvent_flatten(para.perform_mask)

        # resolution = best class's FSC crossing (the reference tracks _res
        # per class and ladders on the best, src/Model.cpp resolution
        # bookkeeping; round-1 keyed off class 0 only)
        res = max(
            int(spectrum.res_p(jnp.asarray(self.fsc[k]),
                               para.thres_cutoff_fsc, r_low=1))
            for k in range(para.k)
        ) if hasattr(self, "fsc") else self.ladder.res
        self.ladder.elevate(res)
        st = self.ladder.transition(para.l_search, para.c_search)
        self.iteration += 1
        rec = {
            "iter": self.iteration,
            "r": self.ladder.r,
            "res_shell": res,
            "res_a": float(self.n * para.pixel_size / max(res, 1)),
            "search_type": st,
            "t_vari": (tv0, tv1),
            "class_distr": getattr(self, "c_distr", None),
            "scale": self.scale.tolist() if self.n_groups > 1 else None,
        }
        self.history.append(rec)
        return rec

    def run(self, max_iter=None):
        max_iter = max_iter or self.para.iter_max
        for _ in range(max_iter):
            rec = self.run_iteration()
            if self.para.save_ref_each_iter or self.para.save_thu_each_iter:
                self.save_outputs()
            if rec["search_type"] == SEARCH_TYPE_STOP:
                break
        return self.history

    # ---------------------------------------------------------------- output

    def save_outputs(self, final=False):
        """Per-round writers with the reference's exact file naming
        (src/Optimiser.cpp:8250-9149): Reference_{k}_{A,B}_Round_{i}.mrc,
        FSC_Round_{i}.txt, Class_Info_Round_{i}.txt, Meta_Round_{i}.thu."""
        import os

        para = self.para
        out = para.output_directory or "./"
        os.makedirs(out, exist_ok=True)
        prefix = os.path.join(out, para.output_file_prefix)
        tag = "Final" if final else f"Round_{self.iteration:03d}"

        from ..io import write_mrc
        from ..io.thu import ThuColumns, make_table, write_thu

        if para.save_ref_each_iter or final:
            for k in range(para.k):
                if final:
                    write_mrc(f"{prefix}Reference_{k:03d}_Final.mrc",
                              np.asarray((self.refs[0, k] + self.refs[1, k]) / 2),
                              voxel_size=para.pixel_size)
                for h, hn in ((0, "A"), (1, "B")):
                    write_mrc(
                        f"{prefix}Reference_{k:03d}_{hn}_{tag}.mrc",
                        np.asarray(self.refs[h, k]),
                        voxel_size=para.pixel_size,
                    )

        if hasattr(self, "fsc"):
            with open(f"{prefix}FSC_{tag}.txt", "w") as f:
                for i in range(self.fsc.shape[1]):
                    row = " ".join(f"{self.fsc[k][i]:.6f}" for k in range(para.k))
                    f.write(f"{i} {row}\n")
            with open(f"{prefix}Class_Info_{tag}.txt", "w") as f:
                for k in range(para.k):
                    frac = float(np.mean(self.best_class == k))
                    res = int(spectrum.res_p(jnp.asarray(self.fsc[k]),
                                             para.thres_report_fsc, r_low=1))
                    res_a = self.n * para.pixel_size / max(res, 1)
                    f.write(f"{k} {frac:.6f} {res_a:.6f}\n")

        if para.save_thu_each_iter or final:
            st = self.par
            k1 = np.asarray(st["k1"]); k2 = np.asarray(st["k2"])
            k3 = np.asarray(st["k3"])
            table = make_table(
                self.n_imgs,
                particle_paths=getattr(
                    self, "particle_paths",
                    [f"{i+1}@unknown.mrcs" for i in range(self.n_imgs)]),
                micrograph_paths=getattr(
                    self, "micrograph_paths", ["none"] * self.n_imgs),
                voltage=np.asarray(self.ctf_params["voltage"]),
                defocus_u=np.asarray(self.ctf_params["defocus_u"]),
                defocus_v=np.asarray(self.ctf_params["defocus_v"]),
                defocus_theta=np.asarray(self.ctf_params["defocus_theta"]),
                cs=np.asarray(self.ctf_params["cs"]),
                amplitude_contrast=np.asarray(self.ctf_params["amp_contrast"]),
                phase_shift=np.asarray(self.ctf_params["phase_shift"]),
                group_id=self.group_ids + 1,
                class_id=self.best_class,
                quat_0=self.best_quat[:, 0], quat_1=self.best_quat[:, 1],
                quat_2=self.best_quat[:, 2], quat_3=self.best_quat[:, 3],
                k1=k1, k2=k2, k3=k3,
                translation_x=self.best_trans[:, 0],
                translation_y=self.best_trans[:, 1],
                std_translation_x=np.asarray(st["s0"]),
                std_translation_y=np.asarray(st["s1"]),
                defocus_factor=self.best_defocus,
                std_defocus_factor=np.asarray(st["sD"]),
                score=self.scores,
            )
            name = "Meta_Final.thu" if final else f"Meta_{tag}.thu"
            write_thu(f"{prefix}{name}", table)
