"""Fused global-scan likelihood — the Pallas/MXU hot kernel.

The reference's phase-A E-step is a dense (image x pixel) x (rotation x
translation) complex reduction executed by AVX kernels under a streaming
log-sum-exp baseline (src/Optimiser.cpp:622-1136, logDataVSPrior SIMD256/512
:9543/:9915) or by CUDA kernel_logDataVS* (gpu/src/Kernel.cu:827-947). On
TPU the factored form (ops/likelihood.py) is T+1 MXU matmuls per pose tile;
XLA runs them as a lax.scan of separate dispatches with the (B, KR)
intermediate bouncing through HBM every step.

This kernel fuses the WHOLE scan into one Pallas program per (image tile,
pose tile): all T translations loop inside the kernel with the posterior
accumulators resident in VMEM, matmuls run on the MXU in bf16 with float32
accumulation (the reference computes likelihoods in float32; bf16 inputs
with f32 accumulation keeps ~3 significant digits on logL differences,
enough for posterior weights whose softmax tolerance is far coarser), and
the log-sum-exp baseline streams per tile with an exact cross-tile merge in
the epilogue.

Layout choices (see pallas guide):
- tiles (B_T, N_T) = (128, 128): MXU-shaped (128, P) x (P, 128) matmuls,
- pixel axis P stays whole per program (static 4096-bucket => 8 KB rows),
- per-tile baselines avoid any cross-program communication; the epilogue
  rescales tile accumulators to the global per-image baseline (exact).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_T = 128   # image tile
N_T = 128   # pose (k*r) tile

_NEG = -3.0e38  # plain float: no backend init at import time


def _kernel(q_re, q_im, e, pk_re, pk_im, tra_re, tra_im, prior_r, prior_t,
            valid_n, wr_ref, wc_ref, wt_ref, base_ref, *, n_t, t_pad):
    """One (image tile, pose tile) program.

    q_re/q_im/e: (B_T, P) bf16 — Q = -2 sigRcp ctf conj(dat), E = sigRcp
    ctf^2 (pixel mask folded in by the caller)
    pk_re/pk_im: (N_T, P) bf16 class-projection tile
    tra_re/tra_im: (T, P) bf16 translation phase ramps
    prior_r: (B_T, N_T) f32 rotation prior (0 on pad poses)
    prior_t: (B_T, T) f32 translation prior
    valid_n: (1, N_T) f32 {0,1} pose validity
    Outputs: wr (B_T, N_T), wc (B_T, 128), wt (B_T, t_pad),
    base (B_T, 128) — all under THIS TILE's final baseline. The scalar
    per-image outputs (wc, base) are lane-broadcast to 128-wide blocks:
    Mosaic requires output block lane dims divisible by 128
    (pallas guide; lowering check in jax pallas/mosaic/lowering.py).
    """
    f32 = jnp.float32
    # term2[b, n] = sum_p E[b,p] |P[n,p]|^2 — one MXU matmul on the
    # squared projection tile
    p2 = (pk_re[:] * pk_re[:] + pk_im[:] * pk_im[:])  # bf16 VPU
    term2 = jax.lax.dot_general(
        e[:], p2, (((1,), (1,)), ((), ())), preferred_element_type=f32)
    invalid = (valid_n[:] == 0.0)  # (1, N_T)
    b_t = q_re.shape[0]
    # lane index for one-hot translation-column updates (dynamic lane
    # slicing forces Mosaic relayouts; a masked add does not)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (b_t, t_pad), 1)

    def step(t, carry):
        base, wr, wc, wt = carry
        # tra refs are (T*8, P) with each row sublane-replicated 8x: the
        # dynamic sublane index 8*t is provably 8-aligned for Mosaic (a raw
        # dynamic index at t is not, and a one-hot row-select matmul
        # crashes its tiler)
        t_re = tra_re[pl.ds(t * 8, 8), :][0:1]  # (1, P)
        t_im = tra_im[pl.ds(t * 8, 8), :][0:1]
        qt_re = q_re[:] * t_re - q_im[:] * t_im
        qt_im = q_re[:] * t_im + q_im[:] * t_re
        term1 = jax.lax.dot_general(
            qt_re, pk_re[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) - jax.lax.dot_general(
            qt_im, pk_im[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        log_l = jnp.where(invalid, _NEG, term1 + term2)  # (B_T, N_T)
        cmax = jnp.max(log_l, axis=1, keepdims=True)     # (B_T, 1)
        new_base = jnp.maximum(base, cmax)
        scale = jnp.exp(base - new_base)
        w = jnp.exp(log_l - new_base)                    # (B_T, N_T)
        onehot = (lane_t == t).astype(f32)               # (B_T, t_pad)
        # prior_t is lane-padded to t_pad with zeros (16-lane vectors crash
        # the Mosaic tiler); the one-hot picks the live column
        pt_col = jnp.sum(prior_t[:] * onehot, axis=1, keepdims=True)
        wpr = w * prior_r[:]
        wr = wr * scale + w * pt_col
        wsum = jnp.sum(wpr, axis=1, keepdims=True)       # (B_T, 1)
        wc = wc * scale + wsum * pt_col
        # all previously written wt columns rescale to the new baseline;
        # this step's column = sum_n w * prior_r
        wt = wt * scale + wsum * onehot
        return new_base, wr, wc, wt

    init = (
        jnp.full((b_t, 1), _NEG, f32),
        jnp.zeros((b_t, N_T), f32),
        jnp.zeros((b_t, 1), f32),
        jnp.zeros((b_t, t_pad), f32),
    )
    base, wr, wc, wt = jax.lax.fori_loop(0, n_t, step, init)
    wr_ref[:] = wr
    wc_ref[:] = jnp.broadcast_to(wc, (b_t, 128))
    wt_ref[:] = wt
    base_ref[:] = jnp.broadcast_to(base, (b_t, 128))


@partial(jax.jit, static_argnames=("k", "interpret"))
def global_scan_fused(q, e, proj, tra, prior_r, prior_t, *, k=1,
                      interpret=False):
    """Fused factored global-search posterior accumulation.

    q: (B, P) complex64 = -2 sigRcp ctf pm conj(dat)
    e: (B, P) f32 = sigRcp ctf^2 pm
    proj: (K, R, P) complex64 class projections
    tra: (T, P) complex64 translation ramps
    prior_r: (B, R) f32; prior_t: (B, T) f32
    Returns dict wC (B, K), wR (B, K, R), wT (B, K, T), baseline (B,) —
    identical semantics to likelihood.global_search_weights.
    """
    b, p = q.shape
    kk, r, _ = proj.shape
    assert kk == k
    t = tra.shape[0]
    bf16 = jnp.bfloat16

    # pad poses per class to a multiple of N_T so tiles never straddle a
    # class boundary; pad images to a multiple of B_T
    r_pad = -(-r // N_T) * N_T
    b_pad = -(-b // B_T) * B_T
    pk = jnp.concatenate(
        [proj, jnp.zeros((k, r_pad - r, p), proj.dtype)], axis=1
    ).reshape(k * r_pad, p)
    pr = jnp.concatenate(
        [jnp.broadcast_to(prior_r[:, None, :], (b, k, r)),
         jnp.zeros((b, k, r_pad - r), prior_r.dtype)], axis=2
    ).reshape(b, k * r_pad)
    valid = jnp.concatenate(
        [jnp.ones((k, r), jnp.float32), jnp.zeros((k, r_pad - r),
                                                  jnp.float32)],
        axis=1).reshape(1, k * r_pad)

    def bpad(x):
        return jnp.concatenate(
            [x, jnp.zeros((b_pad - b,) + x.shape[1:], x.dtype)], 0)

    t_pad = -(-t // 128) * 128  # Mosaic: lane dims % 128 == 0
    q_re = bpad(q.real).astype(bf16)
    q_im = bpad(q.imag).astype(bf16)
    e_b = bpad(e).astype(bf16)
    pr = bpad(pr)
    pt = bpad(jnp.concatenate(
        [prior_t, jnp.zeros((b, t_pad - t), prior_t.dtype)], axis=1))
    pk_re = pk.real.astype(bf16)
    pk_im = pk.imag.astype(bf16)
    # sublane-replicate each translation row 8x (see kernel comment)
    tra_re = jnp.repeat(tra.real.astype(bf16), 8, axis=0)
    tra_im = jnp.repeat(tra.imag.astype(bf16), 8, axis=0)

    n_b, n_n = b_pad // B_T, (k * r_pad) // N_T
    vmem = pltpu.VMEM
    row_specs = [  # image-tile blocks, full pixel axis
        pl.BlockSpec((B_T, p), lambda i, j: (i, 0), memory_space=vmem)
        for _ in range(3)
    ]
    pose_specs = [  # pose-tile blocks
        pl.BlockSpec((N_T, p), lambda i, j: (j, 0), memory_space=vmem)
        for _ in range(2)
    ]
    full_specs = [  # translations: replicated to every program, (T*8, P)
        pl.BlockSpec((t * 8, p), lambda i, j: (0, 0), memory_space=vmem)
        for _ in range(2)
    ]
    wr_p, wc_p, wt_p, base_p = pl.pallas_call(
        partial(_kernel, n_t=t, t_pad=t_pad),
        grid=(n_b, n_n),
        in_specs=row_specs + pose_specs + full_specs + [
            pl.BlockSpec((B_T, N_T), lambda i, j: (i, j), memory_space=vmem),
            pl.BlockSpec((B_T, t_pad), lambda i, j: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, N_T), lambda i, j: (0, j), memory_space=vmem),
        ],
        out_specs=[
            pl.BlockSpec((B_T, N_T), lambda i, j: (i, j), memory_space=vmem),
            pl.BlockSpec((B_T, 128), lambda i, j: (i, j), memory_space=vmem),
            pl.BlockSpec((B_T, t_pad), lambda i, j: (i, j),
                         memory_space=vmem),
            pl.BlockSpec((B_T, 128), lambda i, j: (i, j), memory_space=vmem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k * r_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, n_n * 128), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, n_n * t_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, n_n * 128), jnp.float32),
        ],
        interpret=interpret,
    )(q_re, q_im, e_b, pk_re, pk_im, tra_re, tra_im, pr, pt, valid)

    # epilogue: merge per-tile baselines exactly (the 128-wide scalar
    # blocks are lane-broadcast copies; column 0 is the value)
    base_p = base_p.reshape(b_pad, n_n, 128)[:, :, 0]      # (B, n_n)
    wc_p = wc_p.reshape(b_pad, n_n, 128)[:, :, 0]
    base = jnp.max(base_p, axis=1, keepdims=True)          # (B, 1)
    scale = jnp.exp(base_p - base)                         # (B, n_n)
    wr = (wr_p.reshape(b_pad, n_n, N_T) * scale[..., None]).reshape(
        b_pad, k, r_pad)[:b, :, :r]
    wt_p = wt_p.reshape(b_pad, n_n, t_pad)[:, :, :t] * scale[..., None]
    tiles_per_k = r_pad // N_T
    wc = jnp.sum((wc_p * scale).reshape(b_pad, k, tiles_per_k), 2)[:b]
    wt = jnp.sum(wt_p.reshape(b_pad, k, tiles_per_k, t), 2)[:b]
    return {"wC": wc, "wR": wr, "wT": wt, "baseline": base[:b, 0]}
