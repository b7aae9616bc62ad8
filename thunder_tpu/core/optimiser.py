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
from ..ops.translate import translation_phase
from . import projector, reconstructor, sampling

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

        imgs = self._preprocess(jnp.asarray(imgs))
        self.imgs_ft = fft_ops.fft2_center(imgs)
        # pose estimates per image
        self.best_class = np.zeros(self.n_imgs, np.int32)
        self.best_quat = np.tile(np.array([1.0, 0, 0, 0], np.float32),
                                 (self.n_imgs, 1))
        self.best_trans = np.zeros((self.n_imgs, 2), np.float32)
        self.best_phi = np.zeros(self.n_imgs, np.float32)  # 2D mode

    def _preprocess(self, imgs):
        """statImg + substractBgImg + normaliseImg + maskImg
        (src/Optimiser.cpp:4608-4720): background ring stats -> zero-mean,
        unit-std background -> soft mask (zero fill when zeroMask)."""
        n = self.n
        r_mask = self.para.mask_radius_px
        ew = 6.0  # EDGE_WIDTH_RL (include/Macro.h)
        alpha = soft_mask_shape((n, n), r_mask, ew)
        bg_w = 1.0 - alpha
        denom = jnp.maximum(jnp.sum(bg_w), 1.0)
        mean = jnp.sum(imgs * bg_w, axis=(-2, -1), keepdims=True) / denom
        var = jnp.sum(((imgs - mean) ** 2) * bg_w, axis=(-2, -1), keepdims=True) / denom
        imgs = (imgs - mean) / jnp.sqrt(jnp.maximum(var, 1e-12))
        if self.para.zero_mask:
            imgs = imgs * alpha
        return imgs

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

    def _gather_ring_data(self, ring, idx):
        """Observed pixels, CTF and sigma reciprocal on the ring for a subset
        of images."""
        dat = pixels.gather_pixels(self.imgs_ft[idx], ring)
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
        """Global scan (phase A) for every image, per hemisphere."""
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
        else:
            quats = sampling.sample_rotations_3d(
                kr, n_r, self.sym.quat if self.sym.n_elements else None
            )
            rots3 = quat.rotate3d(quats)
        trans = sampling.sample_translations(kt, n_t, para.trans_s)
        tra = translation_phase(col, row, trans[:, 0], trans[:, 1], self.n)

        t_vari = []
        for h in (0, 1):
            idx = np.nonzero(self.halves == h)[0]
            if len(idx) == 0:
                continue
            # class projections from this hemisphere's reference
            projs = []
            for k in range(para.k):
                if para.mode == "2d":
                    ref_ft = projector.build_projectee_2d(
                        self.refs[h, k, self.n // 2], pf=para.pf
                    )
                    projs.append(projector.project_pixels_2d(
                        ref_ft, rots2, col, row, pf=para.pf))
                else:
                    ref_ft = projector.build_projectee_3d(
                        self.refs[h, k], pf=para.pf
                    )
                    projs.append(projector.project_pixels_3d(
                        ref_ft, rots3, col, row, pf=para.pf))
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
                cls = np.argmax(wc, axis=1)
                self.best_class[sub] = cls
                r_best = np.argmax(wr[np.arange(len(sub)), cls], axis=1)
                t_best = np.argmax(wt[np.arange(len(sub)), cls], axis=1)
                if para.mode == "2d":
                    self.best_phi[sub] = np.asarray(phis)[r_best]
                else:
                    self.best_quat[sub] = np.asarray(quats)[r_best]
                self.best_trans[sub] = np.asarray(trans)[t_best]
                # translation posterior variance for the ladder (refreshVariance)
                wt_n = wt[np.arange(len(sub)), cls]
                wt_n = wt_n / np.maximum(wt_n.sum(axis=1, keepdims=True), 1e-30)
                mean_t = wt_n @ np.asarray(trans)
                d = np.asarray(trans)[None] - mean_t[:, None]
                var = np.einsum("bt,btj->bj", wt_n, d**2)
                t_vari.append(np.sqrt(np.maximum(var, 0)))
        tv = np.concatenate(t_vari, axis=0).mean(axis=0)
        return float(tv[0]), float(tv[1])

    # ---------------------------------------------------------- maximization

    def _rot_matrices(self, idx):
        if self.para.mode == "2d":
            return quat.rotate2d(jnp.asarray(self.best_phi[idx]))
        return quat.rotate3d(jnp.asarray(self.best_quat[idx]))

    def _predicted_slices(self, ring, idx, h):
        """CTF-free predicted (translated) slices at the current best pose."""
        col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
        rots = self._rot_matrices(idx)
        pri = []
        for k in range(self.para.k):
            if self.para.mode == "2d":
                ref_ft = projector.build_projectee_2d(
                    self.refs[h, k, self.n // 2], pf=self.para.pf)
                pri.append(projector.project_pixels_2d(ref_ft, rots, col, row,
                                                       pf=self.para.pf))
            else:
                ref_ft = projector.build_projectee_3d(self.refs[h, k],
                                                      pf=self.para.pf)
                pri.append(projector.project_pixels_3d(ref_ft, rots, col, row,
                                                       pf=self.para.pf))
        pri = jnp.stack(pri)  # (K, B, P)
        pri = pri[self.best_class[idx], jnp.arange(len(idx))]
        t = jnp.asarray(self.best_trans[idx])
        tra = translation_phase(col, row, t[:, 0], t[:, 1], self.n)
        return pri * tra

    def maximization_sigma(self):
        """allReduceSigma, masked path (src/Optimiser.cpp:6397-6710):
        sig(group, shell) = mean_l power_shell(dat - ctf * pri) / 2."""
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
            dat, c, _ = self._gather_ring_data(ring, idx)
            pri = self._predicted_slices(ring, idx, h)
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
                state = reconstructor.empty_state(
                    self.n, pf=para.pf, mode="3d" if para.mode == "3d" else "2d"
                )
                if len(idx):
                    dat, c, _ = self._gather_ring_data(ring, idx)
                    # un-translate observed pixels (reconstructRef translates
                    # by -t before insertP)
                    t = jnp.asarray(self.best_trans[idx])
                    tra = translation_phase(col, row, -t[:, 0], -t[:, 1], self.n)
                    dat = dat * tra
                    rots = self._rot_matrices(idx)
                    w = jnp.ones((len(idx),))
                    bs = 256
                    for s in range(0, len(idx), bs):
                        state = reconstructor.insert_pixels_3d(
                            state, dat[s:s+bs], c[s:s+bs], rots[s:s+bs],
                            col, row, w[s:s+bs], pf=para.pf, pixel_mask=pmask,
                        )
                if self.sym.n_elements:
                    state = reconstructor.symmetrize(
                        state, jnp.asarray(self.sym.rot.astype(np.float32)),
                        self.max_r, pf=para.pf,
                    )
                maps.append(state)
            # golden-standard FSC between the two raw half-F's is computed
            # from reconstructed maps below
            prev_fsc = getattr(self, "fsc", None)
            fsc_k = (jnp.ones((self.n // 2,)) if prev_fsc is None
                     else jnp.asarray(prev_fsc[k]))
            vols = [
                reconstructor.reconstruct(
                    m["F"], m["T"], fsc_k, self.n, pf=para.pf,
                    max_radius=r_u, join_half=False,
                )
                for m in maps
            ]
            ft_a, ft_b = fft_ops.fft3_center(vols[0]), fft_ops.fft3_center(vols[1])
            fsc_new = spectrum.frc_fsc(ft_a, ft_b, self.n // 2, 3)
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
        para = self.para
        tv0, tv1 = self.expectation()
        self.ladder.record_t_vari(tv0, tv1)
        self.maximization_sigma()
        self.reconstruct()
        # resolution from best-class FSC
        res = int(spectrum.res_p(jnp.asarray(self.fsc[0]),
                                 para.thres_cutoff_fsc, r_low=1))
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
        }
        self.history.append(rec)
        return rec

    def run(self, max_iter=None):
        max_iter = max_iter or self.para.iter_max
        for _ in range(max_iter):
            rec = self.run_iteration()
            if rec["search_type"] == SEARCH_TYPE_STOP:
                break
        return self.history
