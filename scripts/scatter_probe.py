"""Scatter-strategy probe for the M-step gridding insert (round 5).

r4 ground truth: XLA .at[].add of width-24 rows costs ~121 ns/row on the
big accumulator, sorted/unique hints change nothing, channel-splitting
loses. Open questions this probe answers on the real chip:

1. Is scatter cost TABLE-SIZE-driven like gather (15 ns/idx at 144 MB
   vs 5.5 at <=2 MB)?  If yes, a z-slab-partitioned accumulator wins.
2. What does a Pallas serial dynamic-index accumulate in VMEM cost per
   sample?  (XLA's scatter is a serialized ~120-cycle loop; a Mosaic
   load-add-store on a VMEM-resident tile may be far cheaper.)
3. jax.lax.sort (int32 key, int32 pos) throughput at insert-scale N,
   for a sort -> binned-accumulate pipeline.
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    n_idx = 4_000_000

    # ---- 1. .at[].add width-24 vs table rows
    for mc in (293, 165, 101, 51):
        rows = mc ** 3 + 1
        tab = jnp.zeros((rows, 24), jnp.float32)
        idx = jnp.asarray(rng.integers(0, rows - 1, n_idx).astype(np.int32))
        val = jnp.asarray(rng.normal(size=(n_idx, 24)).astype(np.float32))

        @jax.jit
        def f(tab, idx, val, salt, nr):
            t = tab.at[jnp.minimum(idx + salt, nr - 1)].add(val)
            return jnp.sum(t[:2, 0])

        float(f(tab, idx, val, 0, rows))
        ts = []
        for i in range(1, 4):
            t0 = time.perf_counter()
            float(f(tab, idx, val, i, rows))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"[scatter] mc={mc:<4} rows={rows:>9}  {t*1e3:7.1f} ms  "
              f"{t/n_idx*1e9:6.2f} ns/row", flush=True)

    # ---- 2. Pallas one-hot MXU accumulate (pre-binned window)
    # samples binned into a WIN-row window, 128 samples per matmul step:
    # acc[WIN, 24] += onehot(idx)[WIN, 128] @ val[128, 24]
    # layouts: idx (8, n/8? no) -> (1, N) lane-major; val (24, N) lane-major
    WIN = 512
    n_p = 4_194_304
    BLK = 16384  # samples per program

    def _kern_mxu(idx_ref, val_ref, out_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        rows_i = jax.lax.broadcasted_iota(jnp.int32, (WIN, 128), 0)

        def body(i, _):
            idx = idx_ref[0, pl.ds(i * 128, 128)]  # (128,)
            oh = (rows_i == idx[None, :]).astype(jnp.float32)
            vt = val_ref[:, pl.ds(i * 128, 128)]  # (24, 128)
            acc[:] += jax.lax.dot_general(
                oh, vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, BLK // 128, body, 0)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    @jax.jit
    def pallas_mxu(idx, val):
        return pl.pallas_call(
            _kern_mxu,
            grid=(n_p // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((24, BLK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((WIN, 24), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((WIN, 24), jnp.float32),
            scratch_shapes=[pltpu.VMEM((WIN, 24), jnp.float32)],
        )(idx, val)

    idx_m = jnp.asarray(
        rng.integers(0, WIN, (1, n_p)).astype(np.int32))
    val_p = jnp.asarray(rng.normal(size=(24, n_p)).astype(np.float32))
    try:
        float(jnp.sum(pallas_mxu(idx_m, val_p)[0]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(pallas_mxu(idx_m, val_p)[0]))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"[pallas-mxu win={WIN}]  {t*1e3:7.1f} ms  "
              f"{t/n_p*1e9:6.2f} ns/sample", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[pallas-mxu] FAILED: {type(e).__name__}: {e}", flush=True)

    # ---- 3. sort throughput (key, pos)
    n_s = 16_000_000
    keys = jnp.asarray(rng.integers(0, 2**28, n_s).astype(np.int32))
    pos = jnp.arange(n_s, dtype=jnp.int32)

    @jax.jit
    def srt(k, p, salt):
        ks, ps = jax.lax.sort((k + salt, p), num_keys=1)
        return ks[0] + ps[-1]

    float(srt(keys, pos, 0))
    ts = []
    for i in range(1, 4):
        t0 = time.perf_counter()
        float(srt(keys, pos, i))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"[sort] n={n_s}  {t*1e3:7.1f} ms  {t/n_s*1e9:6.2f} ns/elem",
          flush=True)


if __name__ == "__main__":
    main()
