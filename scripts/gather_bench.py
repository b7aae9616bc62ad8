"""Microbenchmark: gather/scatter strategies for Fourier-slice projection and
gridding insertion on TPU. These two ops dominate the refine round (probe:
1100 ms gather, 2288 ms scatter vs 0.33 ms likelihood), so the kernel
strategy chosen here decides the framework's throughput.

Variants probed (all compute the same math):
  gather:  complex flat-take | two f32 flat-takes | f32 take sorted-by-index
           | one linearized take of packed (re,im) pairs
  scatter: complex at[].add | two f32 at[].add | sort + segment_sum
           | bincount-style dense one-hot matmul (small alphabets only)

Prints one JSON line per variant.
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


def report(name, dt, note=""):
    rec = {"variant": name, "ms": round(dt * 1e3, 3)}
    if note:
        rec["note"] = note
    print(json.dumps(rec), flush=True)


def main():
    m = 320            # padded volume edge
    n_rot, p = 1024, 4096
    n_idx = n_rot * p * 8  # corner count
    rng = np.random.default_rng(0)

    vr = jnp.asarray(rng.normal(size=(m, m, m)).astype(np.float32))
    vi = jnp.asarray(rng.normal(size=(m, m, m)).astype(np.float32))
    # random corner indices within the r<=80 ball around center (realistic)
    u = rng.normal(size=(n_idx, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    rad = 80 * np.cbrt(rng.uniform(0, 1, size=(n_idx, 1)))
    idx3 = np.clip((u * rad).astype(np.int32) + m // 2, 0, m - 1)
    lin = (idx3[:, 0].astype(np.int64) * m + idx3[:, 1]) * m + idx3[:, 2]
    lin = lin.astype(np.int32)
    lin_j = jnp.asarray(lin)
    lin_sorted = jnp.asarray(np.sort(lin))
    w = jnp.asarray(rng.normal(size=(n_idx,)).astype(np.float32))

    # --- gather variants
    g_f32 = jax.jit(lambda vr, vi, ix: (jnp.take(vr.reshape(-1), ix) * 1.0
                                        + jnp.take(vi.reshape(-1), ix)).sum())
    report("gather_f32x2_flat_take", timeit(g_f32, vr, vi, lin_j),
           note=f"{n_idx/1e6:.0f}M idx")
    report("gather_f32x2_flat_take_sorted", timeit(g_f32, vr, vi, lin_sorted))

    vc = jax.jit(lambda r, i: jax.lax.complex(r, i))(vr, vi)
    g_c = jax.jit(lambda v, ix: jnp.abs(jnp.take(v.reshape(-1), ix)).sum())
    report("gather_c64_flat_take", timeit(g_c, vc, lin_j))

    # packed (re, im) in last dim: one take of 2-vectors
    vp = jax.jit(lambda r, i: jnp.stack([r.reshape(-1), i.reshape(-1)], -1))(vr, vi)
    g_p = jax.jit(lambda v, ix: jnp.take(v, ix, axis=0).sum())
    report("gather_packed_pairs", timeit(g_p, vp, lin_j))

    # row gather: reshape (m*m, m), take rows then index within — traffic
    # m floats per row but contiguous
    vrow_r = vr.reshape(m * m, m)
    vrow_i = vi.reshape(m * m, m)
    row_idx = jnp.asarray((lin // m)[: n_idx // 8])  # 1/8 the count (pairs)
    sub_idx = jnp.asarray((lin % m)[: n_idx // 8])

    def g_rows(vrow, ri, si):
        rows = jnp.take(vrow, ri, axis=0)  # (N, m)
        return jnp.take_along_axis(rows, si[:, None], axis=1).sum()

    report("gather_rows_take(1/8_count)",
           timeit(jax.jit(g_rows), vrow_r, row_idx, sub_idx))

    # --- scatter variants
    s_f32 = jax.jit(lambda ix, w: jnp.zeros((m * m * m,), jnp.float32)
                    .at[ix].add(w).sum())
    report("scatter_f32_at_add", timeit(s_f32, lin_j, w, n=3))

    def s_sorted(ix, w):
        order = jnp.argsort(ix)
        ix_s = ix[order]
        w_s = w[order]
        return jnp.zeros((m * m * m,), jnp.float32).at[ix_s].add(
            w_s, indices_are_sorted=True).sum()

    report("scatter_sort_then_add", timeit(jax.jit(s_sorted), lin_j, w, n=3))

    def s_seg(ix, w):
        order = jnp.argsort(ix)
        return jax.ops.segment_sum(
            w[order], ix[order], num_segments=m * m * m,
            indices_are_sorted=True).sum()

    report("scatter_sort_segment_sum", timeit(jax.jit(s_seg), lin_j, w, n=3))

    # scatter with presorted input (isolates the sort cost)
    s_pre = jax.jit(lambda ix, w: jax.ops.segment_sum(
        w, ix, num_segments=m * m * m, indices_are_sorted=True).sum())
    report("scatter_presorted_segment_sum", timeit(s_pre, lin_sorted, w, n=3))

    # the sort alone
    srt = jax.jit(lambda ix: jnp.argsort(ix).astype(jnp.float32).sum())
    report("argsort_33M_i32", timeit(srt, lin_j, n=3))


if __name__ == "__main__":
    main()
