"""Bisect the global-scan worker fault at the demo shape.

demo_roundtrip (512 particles, demo.json m_s=10000 -> R=2500 scan
rotations, first-round band r~8) kills the TPU worker inside
engine.scan_init. Knobs: --fused on/off (Pallas vs XLA scan path),
--particles, --ms, --chunk.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=512)
    ap.add_argument("--ms", type=int, default=10000)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--fused", default="on", choices=("on", "off"))
    ap.add_argument("--n", type=int, default=160)
    ap.add_argument("--init-res", type=float, default=25.0)
    args = ap.parse_args()

    import jax

    from thunder_tpu.config import Para
    from thunder_tpu.core.optimiser import Optimiser

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
        trans_s=2.0, init_res=args.init_res, global_search_res=15.0,
        sym="C4", m_s=args.ms, m_l_r=125, m_l_t=9, m_l_d=9, m_reco=100,
        c_search=False, l_search=True, pf=2, seed=7,
        image_batch=args.chunk, fused_kernels=args.fused,
        save_ref_each_iter=False, save_thu_each_iter=False,
        output_directory="/tmp/scan_repro_out",
    )
    os.makedirs(para.output_directory, exist_ok=True)
    opt = Optimiser(para)
    opt.set_data(stack, cp)
    opt.init_reference(vol=rng.normal(0, 1.0, (n, n, n)).astype(np.float32))
    opt.init_sigma()

    print(f"[scan] devices={jax.devices()} particles={b} m_s={args.ms} "
          f"chunk={args.chunk} fused={args.fused} r={opt.ladder.r}",
          flush=True)
    t0 = time.perf_counter()
    opt.global_scan()
    import jax.numpy as jnp
    float(jnp.sum(opt.par["c"]))
    print(f"[scan] PASS in {time.perf_counter() - t0:.1f}s (incl compile)",
          flush=True)
    t0 = time.perf_counter()
    opt.global_scan()
    float(jnp.sum(opt.par["c"]))
    print(f"[scan] second call {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
