"""Sub-bisect the phase-B gather pipeline on the real chip.

phase_bisect.py showed the fused-class gather is 513 of 522 ms/phase at
the bench chunk shape. This breaks that 513 ms down:

  coords   — rotation matrices + slice coords einsum
  corners  — + floor/frac -> flat idx + w8 weights
  take     — + the raw (N, 8) row gather (no unpack, plain row sum)
  interp   — + bf16-pair unpack and the 8-wide interpolation dot (= full)

and times alternative formulations of the take:
  take16       — f32 table, (N, 16) rows (is 8->16 lanes really 2x?)
  take-rchunk  — the same take split into R-blocks via lax.map
  take-flat1   — (N*8,) flat table, 8 single-lane takes

All programs run `reps` phases inside one jitted fori_loop; sync via a
float() scalar pull (axon: block_until_ready does not sync).
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
    ap.add_argument("--mlr", type=int, default=125)
    ap.add_argument("--p", type=int, default=4096)
    ap.add_argument("--mc", type=int, default=165)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thunder_tpu.core import projector
    from thunder_tpu.geom import quat
    from thunder_tpu.ops import brick

    b, R, P, mc = args.b, args.mlr, args.p, args.mc
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    n = 160

    tab8 = jnp.asarray(rng.normal(size=(mc ** 3, 8)).astype(np.float32))
    tab16 = jnp.asarray(rng.normal(size=(mc ** 3, 16)).astype(np.float32))
    q = quat.random_quat(key, b * R).reshape(b, R, 4)
    fr = np.arange(n) - n // 2
    cg, rg = np.meshgrid(fr, fr, indexing="xy")
    sel = np.argsort((cg ** 2 + rg ** 2).reshape(-1))[:P]
    col = jnp.asarray(cg.reshape(-1)[sel].astype(np.float32))
    row = jnp.asarray(rg.reshape(-1)[sel].astype(np.float32))

    def timed(name, make_body, *xs):
        @jax.jit
        def run(args_):
            def body(i, acc):
                return acc + make_body(i, args_)
            out = jax.lax.fori_loop(0, args.reps,  body,
                                    jnp.zeros((), jnp.float32))
            return out
        float(run(xs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(xs))
            ts.append(time.perf_counter() - t0)
        t = min(ts) / args.reps
        n_idx = b * R * P
        print(f"[gbisect] {name:<12} {t * 1e3:8.1f} ms/phase "
              f"({t / n_idx * 1e9:5.2f} ns/idx)", flush=True)
        return t

    # coords: rotate + slice coords (salt by i so no CSE across reps)
    def coords_of(i, q_):
        rots = quat.rotate3d(q_ + i * 1e-6)
        return projector.slice_coords_3d(rots, col, row, pf=2)

    timed("coords", lambda i, xs: jnp.sum(coords_of(i, xs[0])[..., 0]) * 1e-9,
          q)

    def corners_of(i, q_):
        c = coords_of(i, q_)
        return brick._corners3(c, mc)

    timed("corners", lambda i, xs: (
        jnp.sum(corners_of(i, xs[0])[1][..., 0]) * 1e-9), q)

    def take_of(i, q_, tab):
        idx, w8, valid = corners_of(i, q_)
        idx = jnp.where(valid, idx, 0)
        rows = jnp.take(tab, idx.reshape(-1), axis=0)
        return rows.reshape(idx.shape + (tab.shape[-1],))

    timed("take8", lambda i, xs: jnp.sum(take_of(i, xs[0], xs[1])[..., 0])
          * 1e-9, q, tab8)
    timed("interp", lambda i, xs: (
        jnp.sum(jnp.abs(brick.gather_vol3(
            xs[1].reshape(mc, mc, mc, 8), coords_of(i, xs[0])))) * 1e-9),
        q, tab8)
    timed("take16", lambda i, xs: jnp.sum(take_of(i, xs[0], xs[1])[..., 0])
          * 1e-9, q, tab16)

    # R-chunked take: lax.map over blocks of 25 rotations
    def take_rchunk(i, q_, tab):
        def blk(qb):
            return jnp.sum(take_of(i, qb, tab)[..., 0])
        qs = jnp.moveaxis(q_.reshape(b, 5, R // 5, 4), 1, 0)
        return jnp.sum(jax.lax.map(blk, qs))

    timed("take-rchunk", lambda i, xs: take_rchunk(i, xs[0], xs[1]) * 1e-9,
          q, tab8)

    # single-lane flat take x8 (is per-index cost lane-count-bound?)
    flat1 = tab8.reshape(-1)

    def take_flat1(i, q_, f1):
        idx, w8, valid = corners_of(i, q_)
        idx = jnp.where(valid, idx, 0)
        acc = 0.0
        for lane in range(8):
            acc = acc + jnp.sum(jnp.take(f1, idx.reshape(-1) * 8 + lane))
        return acc

    timed("take-flat1x8", lambda i, xs: take_flat1(i, xs[0], xs[1]) * 1e-9,
          q, flat1)


if __name__ == "__main__":
    main()
