"""Profile the phase-B local search at the bench shape and print the
op-level time attribution (tensorboard_plugin_profile xplane parsing).

Usage: python scripts/profile_local.py [--phases 2] [--n 160] ...
"""

import argparse
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=160)
    ap.add_argument("--r", type=int, default=40)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--mlr", type=int, default=125)
    ap.add_argument("--particles", type=int, default=256)
    ap.add_argument("--phases", type=int, default=2)
    ap.add_argument("--out", default="/tmp/thunder_prof")
    args = ap.parse_args()

    import jax

    from thunder_tpu.config import Para
    from thunder_tpu.core import optimiser as opt_mod
    from thunder_tpu.core import particle
    from thunder_tpu.core.optimiser import Optimiser

    particle.MAX_N_PHASE_PER_ITER = args.phases

    n, b = args.n, args.particles
    rng = np.random.default_rng(0)
    stack = rng.normal(0, 1.0, (b, n, n)).astype(np.float32)
    cp = {k: v.astype(np.float32) for k, v in dict(
        voltage=np.full(b, 300e3), defocus_u=rng.uniform(1e4, 2e4, b),
        defocus_v=rng.uniform(1e4, 2e4, b), defocus_theta=np.zeros(b),
        cs=np.zeros(b), amp_contrast=np.full(b, 0.1),
        phase_shift=np.zeros(b)).items()}
    para = Para(
        mode="3d", k=1, size=n, pixel_size=1.32, mask_radius=n * 0.47,
        trans_s=2.0, init_res=25.0, global_search_res=15.0, sym="C4",
        m_s=1024, m_l_r=args.mlr, m_l_t=9, m_l_d=9, m_reco=100,
        c_search=False, l_search=True, pf=2, seed=7, image_batch=args.chunk,
        save_ref_each_iter=False, save_thu_each_iter=False,
        output_directory="/tmp/crash_repro_out",
    )
    os.makedirs(para.output_directory, exist_ok=True)
    opt = Optimiser(para)
    opt.set_data(stack, cp)
    opt.init_reference(vol=rng.normal(0, 1.0, (n, n, n)).astype(np.float32))
    opt.init_sigma()
    opt.ladder.search_type = opt_mod.SEARCH_TYPE_LOCAL
    opt.ladder.r = args.r
    opt.local_search()  # compile + warm
    print("[prof] warm done, tracing...", flush=True)

    opt.ladder.r = args.r
    with jax.profiler.trace(args.out):
        opt.local_search()

    # ---- parse the xplane and print op stats
    planes = sorted(glob.glob(
        os.path.join(args.out, "plugins/profile/*/*.xplane.pb")))
    if not planes:
        print("no xplane found under", args.out)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([planes[-1]], "framework_op_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    out_csv = os.path.join(args.out, "op_stats.csv")
    with open(out_csv, "w") as f:
        f.write(data)
    print("[prof] wrote", out_csv, flush=True)
    # crude print of top rows
    lines = data.splitlines()
    for ln in lines[:40]:
        print(ln[:250])


if __name__ == "__main__":
    main()
