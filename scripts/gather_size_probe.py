"""Measure raw row-gather cost vs TABLE SIZE on the real chip.

The phase-B E-step is gather-bound (~15.6 ns/idx from the 144 MB mc=165
brick table, scripts/gather_bisect.py). BASELINE claims the cost is
size-driven; this probe maps the curve ns/idx(table bytes) for the 8-lane
f32 row layout the E-step uses, with the index count fixed at the bench
chunk's per-phase volume. If the curve drops steeply with size, a tiered
radial table (pixels sorted by |k| gather from nested crops) or a
Hermitian half-space table halves the effective cost with exact math.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-idx", type=int, default=64 * 125 * 4096)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n_idx = args.n_idx

    # mc values: full 165 (144 MB), hermitian-half (84 slabs ~ 73 MB),
    # nested crops down to 2 MB
    shapes = [
        ("mc165 (144M)", 165 ** 3),
        ("half84 (73M)", 84 * 165 * 165),
        ("mc129 (69M)", 129 ** 3),
        ("mc101 (33M)", 101 ** 3),
        ("mc83  (18M)", 83 ** 3),
        ("mc65  (8.8M)", 65 ** 3),
        ("mc41  (2.2M)", 41 ** 3),
        ("mc21  (0.3M)", 21 ** 3),
    ]

    idx_host = rng.integers(0, 2 ** 31 - 1, size=n_idx).astype(np.int32)
    idx_all = jnp.asarray(idx_host)

    for name, rows in shapes:
        tab = jnp.asarray(rng.normal(size=(rows, 8)).astype(np.float32))

        @jax.jit
        def run(tab, idx_all):
            def body(i, acc):
                idx = (idx_all + i) % rows
                rows_g = jnp.take(tab, idx, axis=0)
                return acc + jnp.sum(rows_g[:, 0])
            return jax.lax.fori_loop(0, args.reps, body,
                                     jnp.zeros((), jnp.float32))

        float(run(tab, idx_all))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(tab, idx_all))
            ts.append(time.perf_counter() - t0)
        t = min(ts) / args.reps
        print(f"[gsize] {name:<14} {t * 1e3:8.1f} ms "
              f"({t / n_idx * 1e9:5.2f} ns/idx)", flush=True)
        del tab


if __name__ == "__main__":
    main()
