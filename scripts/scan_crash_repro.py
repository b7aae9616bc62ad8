"""Minimal repro for the round-boundary TPU worker crash in the global
scan (r5: 3/3 demo_roundtrip runs died at a scan_init dispatch AFTER the
first segment — fused on at the first ladder band change, fused off at
round 1). Builds roundtrip-shaped scan inputs and dispatches scan_init
segment-by-segment with hard float() syncs between, so the faulting
dispatch is unambiguous."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=160)
    ap.add_argument("--r-band", type=int, default=8)
    ap.add_argument("--nr", type=int, default=2000)
    ap.add_argument("--nt", type=int, default=30)
    ap.add_argument("--slots", type=int, default=256)
    ap.add_argument("--seg", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--fused", default="off", choices=("off", "on"))
    ap.add_argument("--full-table", action="store_true")
    ap.add_argument("--reps", type=int, default=2,
                    help="extra passes over all segments")
    ap.add_argument("--ballast-gb", type=float, default=0.0,
                    help="HBM ballast to mimic the full process (stacks, "
                    "state, cached buffers)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thunder_tpu.core import projector
    from thunder_tpu.geom import quat
    from thunder_tpu.ops import pixels
    from thunder_tpu.ops.translate import translation_phase
    from thunder_tpu.parallel import engine
    from thunder_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    n = args.n
    mesh = make_mesh()
    print("mesh:", mesh, flush=True)

    ballast = None
    if args.ballast_gb > 0:
        m = int(args.ballast_gb * 2 ** 28)  # f32 elements
        ballast = jax.jit(lambda k: jax.random.normal(k, (m,)))(key)
        print(f"ballast: {float(ballast[0]):.3f} ({args.ballast_gb} GB)",
              flush=True)

    ring = pixels.pixel_ring(n, 0, args.r_band)
    p = ring.n
    print(f"ring: {p} pixels (band {args.r_band})", flush=True)
    col = jnp.asarray(ring.col)
    row = jnp.asarray(ring.row)
    pmask = jnp.asarray(ring.mask)

    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    tab = projector.build_brick_projectee_3d(
        vol, args.r_band, pf=2, dtype=jnp.bfloat16,
        half=not args.full_table)
    bricks = jnp.broadcast_to(tab, (2, 1) + tab.shape)
    bricks = jax.device_put(bricks, engine.half_sharding(mesh))
    print("bricks:", bricks.shape, flush=True)

    quats = quat.random_quat(key, args.nr)
    rots = quat.rotate3d(quats)
    trans = jnp.asarray(rng.normal(0, 2, (args.nt, 2)).astype(np.float32))
    tra = translation_phase(col, row, trans[:, 0], trans[:, 1], n)

    s = args.slots // 2
    mk_c = jax.jit(jax.lax.complex)
    dat = mk_c(jnp.asarray(rng.normal(size=(2, s, p)).astype(np.float32)),
               jnp.asarray(rng.normal(size=(2, s, p)).astype(np.float32)))
    ctf = jnp.asarray(rng.normal(size=(2, s, p)).astype(np.float32))
    sig = jnp.asarray(
        (np.abs(rng.normal(size=(2, s, p))) + 0.5).astype(np.float32))
    keys = engine.plane_keys(key, np.arange(2 * s).reshape(2, s))
    plane = engine.plane_sharding(mesh)
    dat, ctf, sig, keys = (jax.device_put(x, plane)
                           for x in (dat, ctf, sig, keys))

    seg = args.seg // 2
    for rep in range(args.reps):
        for s0 in range(0, s, seg):
            s1 = min(s, s0 + seg)
            t0 = time.perf_counter()
            print(f"[repro] rep {rep} segment {s0}:{s1} dispatch",
                  flush=True)
            st, wc = engine.scan_init(
                mesh, bricks, rots, quats, tra, trans, col, row, pmask,
                dat[:, s0:s1], ctf[:, s0:s1], sig[:, s0:s1],
                keys[:, s0:s1], mode="3d", pf=2, m_l_r=125, m_l_t=9,
                m_l_d=9, chunk=args.chunk, fused=args.fused)
            v = float(jnp.sum(st["c"]) + jnp.sum(wc))
            print(f"[repro] rep {rep} segment {s0}:{s1} done "
                  f"({time.perf_counter() - t0:.2f} s, sum {v:.1f})",
                  flush=True)
    print("[repro] SURVIVED", flush=True)


if __name__ == "__main__":
    main()
