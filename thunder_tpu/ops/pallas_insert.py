"""Sorted-binned gridding insert — the Pallas/MXU scatter replacement.

The M-step back-projection scatters ~1e8 width-24 rows per round into the
band-cropped brick accumulator (the reference does this with CUDA
atomicAdd, gpu/src/Kernel.cu:2276-3126 kernel_InsertT/F, or omp locks,
src/Reconstructor.cpp:569-928). XLA:TPU lowers scatter-add to a serialized
~120 ns/row loop once the table exceeds VMEM (measured r4/r5,
scripts/scatter_probe.py), which made the insert 35 % of the bench round.

TPU-native replacement, measured ~6.8 ns/sample for the accumulate
(scripts/scatter_probe.py, r5 probes):

1. build per-sample records (voxel row, value triple (F.re, F.im, T),
   trilinear fractional coords) — pure VPU work,
2. ONE multi-operand ``jax.lax.sort`` keyed on the voxel row carries the
   whole payload (~5.4 ns/elem; sorting (key, position) and gathering the
   payload afterwards measured 3x slower),
3. ``searchsorted`` bins the sorted stream into WIN-row windows,
4. a dense-grid Pallas kernel gives each window program its (24, WIN)
   accumulator tile in VMEM and DMA-streams its sample chunk range from
   HBM, expanding the 8 trilinear corners and accumulating 128 samples
   per step with a one-hot MXU matmul:
       acc[24, WIN] += val24[24, 128] @ onehot[WIN, 128]^T
   (there is no vector scatter on TPU — the one-hot contraction IS the
   Mosaic scatter primitive).

Mosaic constraints that shaped the layout (bisected on v5e, r5):
- DMA minor-dim dynamic offsets must be PROVABLY aligned — offsets are
  chunk_id * CHUNK; per-window chunk ranges are supersets of the window's
  sample segment, and the one-hot's row-range test drops out-of-window
  samples for free (no per-sample validity mask needed),
- DMA sources sliced on the minor dim need >= 8 sublanes — the sorted
  stream is ONE (8, N_pad) f32 array with the voxel row bitcast into
  row 6 (int32 payloads and 6-sublane sources crash the Mosaic tiler).

The table is held LANE-MAJOR (24, n_rows_pad) so window blocks tile
cleanly; ``brick.fold_insert3_lane`` folds it back to voxels.

Numerical note: contributions accumulate in f32 exactly like the XLA
scatter path; only the ADD ORDER differs (sorted by voxel rather than by
draw), a reordering of the same f32 sums.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 512        # rows per window program (VMEM accumulator tile)
CHUNK = 1024     # samples DMA'd per inner step
LANES = 128      # samples per one-hot matmul

# payload rows in the (8, N_pad) sorted stream
_FR, _FI, _TV, _FZ, _FY, _FX, _IDX = range(7)


def _kernel(clo_ref, chi_ref, pay_ref, tab_ref, out_ref, acc, pay_scr,
            sems):
    """One WIN-row window: stream my chunk range, accumulate matching
    rows. clo/chi: per-window first/one-past-last CHUNK id."""
    pid = pl.program_id(0)
    bin_base = pid * WIN
    c_lo = clo_ref[pid]
    c_hi = chi_ref[pid]

    acc[:] = jnp.zeros_like(acc)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (WIN, LANES), 0)

    def chunk_body(c, _):
        cp = pltpu.make_async_copy(
            pay_ref.at[:, pl.ds(c * CHUNK, CHUNK)], pay_scr, sems.at[0])
        cp.start()
        cp.wait()

        def sub_body(s, _):
            sl = pl.ds(s * LANES, LANES)
            idx = jax.lax.bitcast_convert_type(
                pay_scr[_IDX:_IDX + 1, sl], jnp.int32)     # (1, LANES)
            rel = idx - bin_base
            # out-of-window samples (including sort pads) match no row
            oh = (rows_i == rel).astype(jnp.float32)       # (WIN, LANES)
            fr = pay_scr[_FR:_FR + 1, sl]
            fi = pay_scr[_FI:_FI + 1, sl]
            tv = pay_scr[_TV:_TV + 1, sl]
            fz = pay_scr[_FZ:_FZ + 1, sl]
            fy = pay_scr[_FY:_FY + 1, sl]
            fx = pay_scr[_FX:_FX + 1, sl]
            # 8 trilinear corner weights, corner order (dz, dy, dx)
            # binary to match brick.fold_insert3's channel order
            wz = jnp.concatenate([1.0 - fz, fz], axis=0)   # (2, LANES)
            wy = jnp.concatenate([1.0 - fy, fy], axis=0)
            wx = jnp.concatenate([1.0 - fx, fx], axis=0)
            w8 = []
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        w8.append(wz[dz:dz + 1] * wy[dy:dy + 1]
                                  * wx[dx:dx + 1])
            w8 = jnp.concatenate(w8, axis=0)               # (8, LANES)
            val24 = jnp.concatenate(
                [fr * w8, fi * w8, tv * w8], axis=0)       # (24, LANES)
            # HIGHEST: Pallas dot_general defaults to one-pass bf16 on
            # TPU, which rounds every contribution to 8 bits (measured
            # 2e-3 rel err on the folded table); the one-hot operand is
            # exact, so 3-pass bf16 recovers f32-grade sums
            acc[:] += jax.lax.dot_general(
                val24, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return 0

        jax.lax.fori_loop(0, CHUNK // LANES, sub_body, 0, unroll=True)
        return 0

    jax.lax.fori_loop(c_lo, c_hi, chunk_body, 0)
    out_ref[:] = tab_ref[:] + acc[:]


@partial(jax.jit, static_argnames=("interpret",))
def binned_update(tab_lane, pay_sorted, c_lo, c_hi, *, interpret=False):
    """tab_lane: (24, R_pad) f32 lane-major accumulator, R_pad % WIN == 0;
    pay_sorted: (8, N_pad) f32 stream SORTED by voxel row, N_pad % CHUNK
    == 0 — rows [F.re, F.im, T, fz, fy, fx, bitcast(idx), 0] with pad
    samples carrying idx >= R_pad; c_lo/c_hi: (R_pad // WIN + 1,) int32
    per-window chunk ranges. Returns the updated table (tab donated)."""
    r_pad = tab_lane.shape[1]
    nb = r_pad // WIN
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((24, WIN), lambda i, lo, hi: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((24, WIN), lambda i, lo, hi: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((24, WIN), jnp.float32),
                pltpu.VMEM((8, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((24, r_pad), jnp.float32),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(c_lo, c_hi, pay_sorted, tab_lane)


def rows_pad(n_rows):
    """Accumulator row count padded to the window grid."""
    return -(-n_rows // WIN) * WIN


def sort_bin_samples(idx, fr, fi, tv, frac, r_pad):
    """Multi-operand sort by voxel row + window chunk ranges.

    idx: (N,) int32 rows in [0, r_pad) (invalid samples must already
    point at a drop row < r_pad); fr/fi/tv: (N,) f32; frac: (N, 3) f32
    fractional coords (z, y, x). Returns (pay_sorted (8, N_pad),
    c_lo, c_hi (r_pad // WIN + 1,) int32)."""
    n = idx.shape[0]
    ops = jax.lax.sort(
        (idx, fr, fi, tv, frac[:, 0], frac[:, 1], frac[:, 2]), num_keys=1)
    idx_s = ops[0]
    n_pad = -(-n // CHUNK) * CHUNK
    pad = n_pad - n
    pay = jnp.stack(
        ops[1:] + (jax.lax.bitcast_convert_type(idx_s, jnp.float32),
                   jnp.zeros_like(ops[1])), axis=0)  # (8, N)
    pay = jnp.pad(pay, ((0, 0), (0, pad)))
    if pad:  # pad samples: idx r_pad matches no window
        pad_idx = jax.lax.bitcast_convert_type(
            jnp.full((pad,), r_pad, jnp.int32), jnp.float32)
        pay = pay.at[_IDX, n:].set(pad_idx)
    nb = r_pad // WIN
    bounds = jnp.arange(nb + 1, dtype=jnp.int32) * WIN
    starts = jnp.searchsorted(idx_s, bounds).astype(jnp.int32)
    c_lo = starts[:-1] // CHUNK
    c_hi = -(-starts[1:] // CHUNK)
    c_hi = jnp.minimum(jnp.maximum(c_hi, c_lo), n_pad // CHUNK)
    return pay, jnp.append(c_lo, 0), jnp.append(c_hi, 0)


def sorted_insert_update(tab_lane, idx, fr, fi, tv, frac, *,
                         interpret=False):
    """Convenience wrapper: sort + bin + kernel update. See binned_update
    for shapes; idx may contain drop rows as long as they are
    < tab_lane.shape[1]."""
    r_pad = tab_lane.shape[1]
    pay, c_lo, c_hi = sort_bin_samples(idx, fr, fi, tv, frac, r_pad)
    return binned_update(tab_lane, pay, c_lo, c_hi, interpret=interpret)


def reference_insert_update(tab_lane, idx, fr, fi, tv, frac):
    """Pure-XLA oracle with identical semantics (used by CPU tests and as
    the non-TPU fallback check): one width-24 scatter per sample."""
    fz, fy, fx = frac[:, 0], frac[:, 1], frac[:, 2]
    wz = jnp.stack([1 - fz, fz], -1)
    wy = jnp.stack([1 - fy, fy], -1)
    wx = jnp.stack([1 - fx, fx], -1)
    w8 = (wz[:, :, None, None] * wy[:, None, :, None]
          * wx[:, None, None, :]).reshape(-1, 8)
    contrib = jnp.concatenate(
        [fr[:, None] * w8, fi[:, None] * w8, tv[:, None] * w8], axis=-1)
    return tab_lane.T.at[idx].add(contrib).T
