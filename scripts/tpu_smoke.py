"""On-TPU smoke gate: catch hardware/lowering breakage in minutes, not at
bench time (VERDICT r3 weak #4/#6; the reference's analogue is its
Skip-E/M/R debug flags, include/Optimiser.h:382-401).

Stages, each with its own wall-clock budget and a PASS line:
  1. pallas   — the real-Mosaic global-scan kernel on one tile (no
                interpret mode), checked against the XLA path
  2. local    — a GLOBAL scan + blocked LOCAL search round at a small but
                bucketed shape (64 px, r=24 -> 2048-pixel bucket)
  3. reco     — insert_fold_reduce + reconstruct_halves + golden FSC

Run:  python scripts/tpu_smoke.py          (~2-4 min warm cache, <10 cold)
Exit 0 = all green. Any stage failing raises / exits non-zero.

The persistent compilation cache (.jax_cache, enabled in
thunder_tpu/__init__) makes re-runs cheap; this script is the pre-bench
gate: run it after any engine/kernel change before a full bench.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET_S = {"pallas": 240, "local": 360, "reco": 300}


def stage(name):
    def deco(fn):
        def run():
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            budget = BUDGET_S[name]
            status = "PASS" if dt < budget else "SLOW"
            print(f"[smoke] {status} {name} in {dt:.1f}s "
                  f"(budget {budget}s)", flush=True)
            if status != "PASS":
                raise SystemExit(f"stage {name} exceeded budget")
        return run
    return deco


@stage("pallas")
def stage_pallas():
    import jax
    import jax.numpy as jnp
    from thunder_tpu.ops import likelihood

    rng = np.random.default_rng(0)
    b, p, k, r, t = 64, 2048, 1, 128, 16
    # axon cannot transfer complex64 host<->device: combine on device
    mk_c = jax.jit(jax.lax.complex)

    def c64(*shape):
        return mk_c(jnp.asarray(rng.normal(size=shape).astype(np.float32)),
                    jnp.asarray(rng.normal(size=shape).astype(np.float32)))

    dat = c64(b, p)
    ctf = jnp.asarray(rng.normal(size=(b, p)).astype(np.float32))
    # sig_rcp = -0.5/sigma with sigma ~ p keeps logL spreads O(10): with
    # degenerate posteriors any bf16 matmul noise is exponentiated and the
    # comparison is meaningless
    sig_rcp = -0.5 / jnp.asarray(
        p * (np.abs(rng.normal(size=(b, p))).astype(np.float32) + 0.5))
    proj = c64(k, r, p)
    tra = c64(t, p)
    out_f = likelihood.global_search_weights_fused(dat, ctf, sig_rcp, proj,
                                                   tra)
    out_x = likelihood.global_search_weights(dat, ctf, sig_rcp, proj, tra)
    for key in ("wC", "wR", "wT"):
        a = np.asarray(out_f[key], np.float64)
        bx = np.asarray(out_x[key], np.float64)
        # normalize per image: absolute scale carries the baseline
        a /= a.reshape(b, -1).sum(1).reshape((b,) + (1,) * (a.ndim - 1))
        bx /= bx.reshape(b, -1).sum(1).reshape((b,) + (1,) * (bx.ndim - 1))
        err = np.max(np.abs(a - bx))
        assert err < 5e-2, f"fused {key} mismatch: max err {err}"
    print("[smoke] pallas kernel matches XLA path (bf16 tol)", flush=True)


def _small_opt():
    from thunder_tpu.config import Para
    from thunder_tpu.core.optimiser import Optimiser

    n, b = 64, 64
    rng = np.random.default_rng(0)
    g = np.mgrid[:n, :n, :n].astype(np.float32) - n // 2
    vol = np.zeros((n, n, n), np.float32)
    for c, s in [((5, 3, -4), 5.0), ((-6, -2, 3), 4.0), ((0, 7, 0), 3.0)]:
        vol += np.exp(-((g[0] - c[0]) ** 2 + (g[1] - c[1]) ** 2
                        + (g[2] - c[2]) ** 2) / (2 * s * s))
    para = Para(
        mode="3d", k=1, size=n, pixel_size=2.0, mask_radius=28.0,
        trans_s=1.5, init_res=20.0, global_search_res=12.0, sym="C1",
        m_s=512, m_l_r=64, m_l_t=9, m_l_d=9, m_reco=32,
        c_search=False, l_search=True, pf=2, seed=3, image_batch=32,
        save_ref_each_iter=False, save_thu_each_iter=False,
        output_directory="/tmp/tpu_smoke_out",
    )
    os.makedirs(para.output_directory, exist_ok=True)

    import jax
    from thunder_tpu.core import projector
    from thunder_tpu.geom import quat
    from thunder_tpu.ops import fft as fft_ops
    from thunder_tpu.ops.translate import translate_ft
    import jax.numpy as jnp

    q = np.asarray(quat.random_quat(jax.random.PRNGKey(1), b))
    vf = projector.build_projectee_3d(jnp.asarray(vol), pf=2)
    rots = quat.rotate3d(jnp.asarray(q))
    sl = projector.project_full_3d(vf, rots, n, n // 2 - 1, pf=2)
    tr = rng.normal(0, 1.0, (b, 2)).astype(np.float32)
    sl = translate_ft(sl, jnp.asarray(tr[:, 0]), jnp.asarray(tr[:, 1]))
    stack = np.array(np.asarray(fft_ops.ifft2_center(sl).real), np.float32)
    stack += rng.normal(0, 0.5 * stack.std(), stack.shape).astype(np.float32)
    cp = {kk: v.astype(np.float32) for kk, v in dict(
        voltage=np.full(b, 300e3), defocus_u=np.full(b, 1.4e4),
        defocus_v=np.full(b, 1.4e4), defocus_theta=np.zeros(b),
        cs=np.zeros(b), amp_contrast=np.full(b, 0.1),
        phase_shift=np.zeros(b)).items()}
    opt = Optimiser(para)
    opt.set_data(stack, cp)
    opt.init_reference(vol=vol)
    opt.init_sigma()
    return opt


@stage("local")
def stage_local():
    from thunder_tpu.core import optimiser as opt_mod

    opt = _small_opt()
    opt.global_scan()
    opt.ladder.search_type = opt_mod.SEARCH_TYPE_LOCAL
    opt.ladder.r = 24
    tv = opt.local_search()
    assert np.isfinite(tv).all(), f"non-finite t-vari {tv}"
    nph = np.asarray(opt.phase_counts)
    print(f"[smoke] local search ok: t_vari={tuple(round(x, 3) for x in tv)}"
          f" n_phase mean={nph.mean():.1f} max={nph.max()}", flush=True)
    stage_local.opt = opt


@stage("reco")
def stage_reco():
    opt = stage_local.opt
    opt.reconstruct()
    fsc = np.asarray(opt.fsc)
    assert np.isfinite(fsc).all(), "non-finite FSC"
    refs = np.asarray(opt.refs)
    assert np.isfinite(refs).all(), "non-finite reference maps"
    print(f"[smoke] reconstruction ok: FSC head "
          f"{np.round(fsc[0][:5], 3).tolist()}", flush=True)


def main():
    import jax
    print(f"[smoke] devices: {jax.devices()}", flush=True)
    t0 = time.perf_counter()
    stage_pallas()
    stage_local()
    stage_reco()
    print(f"[smoke] ALL PASS in {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
