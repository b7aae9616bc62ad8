"""Bisection harness for the r3 TPU worker fault in engine.local_search.

BENCH_r03 crashed the TPU worker deterministically at the demo shape
(160 px, LOCAL r=40 -> 4096-pixel bucket, mLR=125, mLT=9, image_batch=64)
inside the phase-B shard_map program. This script reproduces exactly that
call with every suspect knob adjustable from the CLI so the faulting
ingredient can be isolated cheaply (compiles are cached via the package's
persistent compilation cache).

Usage: python scripts/crash_repro.py --n 160 --r 40 --chunk 64 --mlr 125 \
          [--phases N] [--f32-tables] [--particles 256]
Prints PASS + timing, or the worker fault propagates.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=160)
    ap.add_argument("--r", type=int, default=40)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--mlr", type=int, default=125)
    ap.add_argument("--mlt", type=int, default=9)
    ap.add_argument("--phases", type=int, default=0,
                    help="cap MAX_N_PHASE_PER_ITER (0 = reference value)")
    ap.add_argument("--f32-tables", action="store_true")
    ap.add_argument("--particles", type=int, default=256)
    ap.add_argument("--sym", default="C4")
    args = ap.parse_args()

    import jax

    from thunder_tpu.config import Para
    from thunder_tpu.core import optimiser as opt_mod
    from thunder_tpu.core import particle
    from thunder_tpu.core.optimiser import Optimiser

    if args.phases:
        particle.MAX_N_PHASE_PER_ITER = args.phases

    n, b = args.n, args.particles
    rng = np.random.default_rng(0)
    stack = rng.normal(0, 1.0, (b, n, n)).astype(np.float32)
    cp = dict(voltage=np.full(b, 300e3), defocus_u=rng.uniform(1e4, 2e4, b),
              defocus_v=rng.uniform(1e4, 2e4, b), defocus_theta=np.zeros(b),
              cs=np.zeros(b), amp_contrast=np.full(b, 0.1),
              phase_shift=np.zeros(b))
    cp = {k: v.astype(np.float32) for k, v in cp.items()}

    para = Para(
        mode="3d", k=1, size=n, pixel_size=1.32, mask_radius=n * 0.47,
        trans_s=2.0, init_res=25.0, global_search_res=15.0, sym=args.sym,
        m_s=1024, m_l_r=args.mlr, m_l_t=args.mlt, m_l_d=9, m_reco=100,
        c_search=False, l_search=True, pf=2, seed=7, image_batch=args.chunk,
        table_bf16=not args.f32_tables,
        save_ref_each_iter=False, save_thu_each_iter=False,
        output_directory="/tmp/crash_repro_out",
    )
    os.makedirs(para.output_directory, exist_ok=True)
    opt = Optimiser(para)
    opt.set_data(stack, cp)
    vol = rng.normal(0, 1.0, (n, n, n)).astype(np.float32)
    opt.init_reference(vol=vol)
    opt.init_sigma()

    import logging
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    opt.log.addHandler(h)
    opt.log.setLevel(logging.DEBUG)

    opt.ladder.search_type = opt_mod.SEARCH_TYPE_LOCAL
    opt.ladder.r = args.r

    print(f"[repro] devices={jax.devices()} n={n} r={args.r} "
          f"chunk={args.chunk} mLR={args.mlr} mLT={args.mlt} "
          f"bf16={not args.f32_tables} phases="
          f"{args.phases or particle.MAX_N_PHASE_PER_ITER}", flush=True)
    t0 = time.perf_counter()
    tv = opt.local_search()
    t1 = time.perf_counter()
    print(f"[repro] PASS local_search in {t1 - t0:.1f}s (incl. compile), "
          f"tv={tv}", flush=True)
    # a second call: compiled-only timing
    opt.ladder.r = args.r
    t0 = time.perf_counter()
    opt.local_search()
    print(f"[repro] second call {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
