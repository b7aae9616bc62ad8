"""Per-stage timing of ONE phase-B phase at the bench chunk shape.

Times cumulative pipelines (perturb -> +coords/gather -> +likelihood ->
+update) as separate jitted programs over a fori_loop of `--reps` phases,
so each stage's marginal on-chip cost is (t[k] - t[k-1]) / reps without
needing device-side profiling (unavailable over the axon tunnel).
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
    ap.add_argument("--mlt", type=int, default=9)
    ap.add_argument("--p", type=int, default=4096)
    ap.add_argument("--mc", type=int, default=165)
    ap.add_argument("--n", type=int, default=160)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--full", action="store_true",
                    help="use the FULL table (default: Hermitian half)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from thunder_tpu.core import particle, projector
    from thunder_tpu.geom import quat
    from thunder_tpu.ops import likelihood
    from thunder_tpu.ops.translate import translation_phase
    from thunder_tpu.parallel.engine import _fused_class_gather

    b, R, T, P, mc, n = args.b, args.mlr, args.mlt, args.p, args.mc, args.n
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    n_chan = 8 if args.bf16 else 16
    half = not args.full
    n_vox = mc ** 3 if args.full else (mc // 2 + 1) * mc * mc
    print(f"[bisect] table: {'full' if args.full else 'half'} "
          f"{n_vox} rows ({n_vox * n_chan * 4 / 1e6:.0f} MB)", flush=True)
    flat = jnp.asarray(rng.normal(size=(n_vox, n_chan)).astype(np.float32))
    q0 = np.asarray(quat.random_quat(key, b))
    st = {
        "r": jnp.asarray(np.repeat(q0[:, None, :], R, 1).astype(np.float32)),
        "t": jnp.asarray(rng.normal(0, 1, (b, T, 2)).astype(np.float32)),
        "wR": jnp.full((b, R), 1.0 / R, jnp.float32),
        "wT": jnp.full((b, T), 1.0 / T, jnp.float32),
        "k1": jnp.full((b,), 0.1, jnp.float32),
        "k2": jnp.full((b,), 0.1, jnp.float32),
        "k3": jnp.full((b,), 0.1, jnp.float32),
        "s0": jnp.full((b,), 1.0, jnp.float32),
        "s1": jnp.full((b,), 1.0, jnp.float32),
        "sD": jnp.full((b,), 0.01, jnp.float32),
        "pfR": jnp.full((b,), 0.2, jnp.float32),
        "pfT": jnp.full((b,), 0.2, jnp.float32),
        "topR": jnp.asarray(q0.astype(np.float32)),
        "topT": jnp.zeros((b, 2), jnp.float32),
    }
    # axon cannot transfer complex64 host<->device: combine on device
    mk_c = jax.jit(jax.lax.complex)
    dat = mk_c(jnp.asarray(rng.normal(size=(b, P)).astype(np.float32)),
               jnp.asarray(rng.normal(size=(b, P)).astype(np.float32)))
    ctf = jnp.asarray(rng.normal(size=(b, P)).astype(np.float32))
    sig = jnp.asarray(np.abs(rng.normal(size=(b, P))).astype(np.float32) + 0.5)
    fr = np.arange(n) - n // 2
    cg, rg = np.meshgrid(fr, fr, indexing="xy")
    r2 = cg ** 2 + rg ** 2
    sel = np.argsort(r2.reshape(-1))[:P]
    col = jnp.asarray(cg.reshape(-1)[sel].astype(np.float32))
    row = jnp.asarray(rg.reshape(-1)[sel].astype(np.float32))
    keys_c = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(b))
    sym_quats = jnp.zeros((0, 4), jnp.float32)
    cls = jnp.zeros((b,), jnp.int32)

    env = dict(flat=flat, dat=dat, ctf=ctf, sig=sig, col=col, row=row,
               keys_c=keys_c, sym_quats=sym_quats, cls=cls)

    def mk(level):
        def body_fn(e):
            def perturb(phase, st):
                kph = jax.vmap(jax.random.fold_in)(
                    e["keys_c"], jnp.full((b,), phase, jnp.uint32))
                subs = jax.vmap(lambda k: jax.random.split(k, 7))(kph)
                r_new = particle.perturb_r(
                    subs[:, 0], st["r"], st["k1"], st["k2"], st["k3"], 0.4,
                    sym_quats=e["sym_quats"])
                t_new = particle.perturb_t(subs[:, 1], st["t"], st["s0"],
                                           st["s1"], 0.4)
                return {**st, "r": r_new, "t": t_new}, subs

            def body(phase, st):
                st2, subs = perturb(phase, st)
                if level == 0:
                    return st2
                rots = quat.rotate3d(st2["r"])
                coords = projector.slice_coords_3d(rots, e["col"], e["row"],
                                                   pf=2)
                proj = _fused_class_gather(e["flat"], coords, e["cls"], mc,
                                           "3d", half=half)
                if level == 1:
                    # fold a scalar of proj back in so it isn't DCE'd
                    return {**st2,
                            "s0": st2["s0"] + 1e-30 * jnp.abs(proj[:, 0, 0])}
                tra = translation_phase(e["col"], e["row"],
                                        st2["t"][..., 0], st2["t"][..., 1], n)
                u_r, u_t, u_d = likelihood.local_search_weights(
                    e["dat"], e["ctf"], e["sig"], proj, tra, st2["wR"],
                    st2["wT"], None)
                if level == 2:
                    return {**st2, "s0": st2["s0"] + 1e-30 * u_r[:, 0]}
                return particle.update_from_likelihood(
                    st2, subs[:, 3:7], u_r, u_t, u_d, with_d=False,
                    sym_quats=e["sym_quats"], mode="3d")
            return body

        @jax.jit
        def run(st, e):
            out = jax.lax.fori_loop(0, args.reps, body_fn(e), st)
            return jnp.sum(out["s0"])  # scalar: forces a real remote sync

        return run

    names = ["perturb", "+gather", "+likelihood", "+update"]
    prev = 0.0
    for lvl in range(4):
        f = mk(lvl)
        float(f(st, env))  # compile + warm (float() = true sync on axon)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(st, env))
            ts.append(time.perf_counter() - t0)
        t = min(ts) / args.reps
        print(f"[bisect] {names[lvl]:<12} {t * 1e3:8.1f} ms/phase "
              f"(marginal {((t - prev)) * 1e3:8.1f} ms)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
