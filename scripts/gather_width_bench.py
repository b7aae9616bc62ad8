"""Is XLA take/scatter cost per-index flat in the fetched row width?

If yes, a corner-cube layout (the 2x2x2 trilinear neighborhood duplicated
into one 64 B cell) turns 8 gathers/point into 1, and packed (re, im, T)
rows turn 4 scatter passes into 1.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=8):
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn(*args)
    float(r)
    t_n = time.perf_counter() - t0
    return max((t_n - t_one) / (n - 1), 1e-9)


def main():
    rng = np.random.default_rng(0)
    n_tab = 32_000_000
    n_idx = 4_000_000
    idx = jnp.asarray(rng.integers(0, n_tab, size=n_idx).astype(np.int32))

    for width in (1, 2, 4, 8, 16, 32):
        tab = jnp.asarray(
            rng.normal(size=(n_tab, width)).astype(np.float32))
        g = jax.jit(lambda t, ix: jnp.take(t, ix, axis=0).sum())
        dt = timeit(g, tab, idx)
        print(json.dumps({
            "op": "take", "width_f32": width,
            "ms": round(dt * 1e3, 2),
            "ns_per_idx": round(dt / n_idx * 1e9, 2),
            "gb_s": round(n_idx * width * 4 / dt / 1e9, 2),
        }), flush=True)

    for width in (1, 2, 3, 4, 8):
        vals = jnp.asarray(rng.normal(size=(n_idx, width)).astype(np.float32))
        s = jax.jit(lambda v, ix: jnp.zeros((n_tab, width), jnp.float32)
                    .at[ix].add(v).sum())
        dt = timeit(s, vals, idx, n=4)
        print(json.dumps({
            "op": "scatter_add", "width_f32": width,
            "ms": round(dt * 1e3, 2),
            "ns_per_idx": round(dt / n_idx * 1e9, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
