"""Probe: does the bare demo-scale E-step gather fault the TPU worker?

Replicates ONLY the _fused_class_gather data movement of one phase-B phase
at the bench shape (chunk 64 images x 125 rotations x 4096 pixels, 8
corners, from a (K*mc^3, C) table with mc=165) — no while_loop, no eigh, no
particle filter. Knobs isolate the suspects from VERDICT r3 weak #1.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--r", type=int, default=125)
    ap.add_argument("--p", type=int, default=4096)
    ap.add_argument("--mc", type=int, default=165)
    ap.add_argument("--chan", type=int, default=8)
    ap.add_argument("--mode", default="gather",
                    choices=["gather", "take", "interp"])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from thunder_tpu.ops import brick

    rng = np.random.default_rng(0)
    n_vox = args.mc ** 3
    tab = jnp.asarray(
        rng.normal(size=(n_vox, args.chan)).astype(np.float32))
    print(f"[probe] table {n_vox}x{args.chan} = "
          f"{n_vox * args.chan * 4 / 1e9:.2f} GB; "
          f"samples {args.b * args.r * args.p / 1e6:.1f} M "
          f"({args.b}x{args.r}x{args.p})", flush=True)

    if args.mode == "take":
        idx = jnp.asarray(rng.integers(
            0, n_vox, size=(args.b, args.r, args.p)).astype(np.int32))

        @jax.jit
        def f(tab, idx, salt):
            rows = jnp.take(tab, (idx + salt).reshape(-1) % n_vox, axis=0)
            return rows.reshape(idx.shape + (args.chan,)).sum()

        out = f(tab, idx, 0)
    else:
        # real coords through _corners3 like the E-step
        coords = jnp.asarray(rng.uniform(
            -args.mc / 2 + 2, args.mc / 2 - 2,
            size=(args.b, args.r, args.p, 3)).astype(np.float32))
        cls = jnp.zeros((args.b,), jnp.int32)

        from thunder_tpu.parallel.engine import _fused_class_gather

        @jax.jit
        def f(tab, coords, cls, salt):
            pr = _fused_class_gather(tab, coords + salt * 1e-3, cls,
                                     args.mc, "3d")
            return jnp.sum(jnp.abs(pr) ** 2)

        out = f(tab, coords, cls, 0)
    out.block_until_ready()
    print("[probe] compiled + first run OK", flush=True)
    # distinct salt per call so no layer can cache/CSE repeat executions;
    # block each call: measures true per-execution device time (+1 rtt)
    dts = []
    for i in range(1, args.iters + 1):
        t0 = time.perf_counter()
        out = (f(tab, idx, i) if args.mode == "take"
               else f(tab, coords, cls, i))
        out.block_until_ready()
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    print(f"[probe] per-call s: {[round(x, 4) for x in dts]}", flush=True)
    n_idx = args.b * args.r * args.p
    print(f"[probe] PASS {dt*1e3:.1f} ms/iter, "
          f"{dt / n_idx * 1e9:.2f} ns/idx, "
          f"{n_idx * args.chan * 4 / dt / 1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
