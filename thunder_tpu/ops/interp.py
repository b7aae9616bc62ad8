"""Bi/trilinear interpolation gathers and their adjoint scatter-adds on
centered grids.

The reference's per-pixel interpolation macros
(include/Functions/Interpolation.h:33-187, Volume::getByInterpolationFT /
addFT) become batched XLA gathers/scatters over flattened linear indices —
the idiomatic TPU shape for what CUDA did with texture fetches and atomicAdd
(gpu/src/Kernel.cu:625-786, :2276-3126).

Coordinates are SIGNED centered units: array index = coord + n//2 per axis.
Out-of-range corners are dropped (gather returns 0 / scatter is discarded),
matching the reference's bounds checks.
"""

import jax.numpy as jnp


def _corner_data(coords, n, dims):
    """Shared floor/weight/corner-index computation.

    coords: (..., dims) float; returns (idx_corners, weights, valid):
      idx_corners: (..., 2**dims) int32 flattened array indices
      weights:     (..., 2**dims) float32 trilinear weights
      valid:       (..., 2**dims) bool
    """
    base = jnp.floor(coords)
    frac = coords - base
    base = base.astype(jnp.int32) + n // 2  # to array indices

    idx = 0
    weights = jnp.ones(coords.shape[:-1] + (1,), dtype=jnp.float32)
    valid = jnp.ones(coords.shape[:-1] + (1,), dtype=bool)
    flat_idx = jnp.zeros(coords.shape[:-1] + (1,), dtype=jnp.int32)
    for d in range(dims):
        b = base[..., d][..., None]  # (..., 1)
        f = frac[..., d][..., None].astype(jnp.float32)
        # corner offsets 0/1 along this dim interleave with previous dims
        off = jnp.asarray([0, 1], dtype=jnp.int32)
        b2 = b[..., :, None] + off  # (..., prev, 2)
        w2 = weights[..., :, None] * jnp.stack([1 - f, f], axis=-1)
        v2 = valid[..., :, None] & (b2 >= 0) & (b2 < n)
        flat2 = flat_idx[..., :, None] * n + jnp.clip(b2, 0, n - 1)
        sh = coords.shape[:-1] + (-1,)
        weights = w2.reshape(sh)
        valid = v2.reshape(sh)
        flat_idx = flat2.reshape(sh)
    return flat_idx, weights, valid


def linear_gather(grid, coords):
    """Interpolate ``grid`` (n^dims, any dtype) at centered ``coords``
    (..., dims). Returns (...,) of grid dtype."""
    dims = coords.shape[-1]
    n = grid.shape[-1]
    flat_idx, w, valid = _corner_data(coords, n, dims)
    vals = jnp.take(grid.reshape(-1), flat_idx, axis=0)
    w = jnp.where(valid, w, 0.0)
    return jnp.sum(vals * w.astype(vals.real.dtype), axis=-1)


def linear_scatter_add(grid, coords, values):
    """Adjoint of linear_gather: spread ``values`` (...,) onto ``grid``
    with the same weights. Returns the updated grid."""
    dims = coords.shape[-1]
    n = grid.shape[-1]
    flat_idx, w, valid = _corner_data(coords, n, dims)
    w = jnp.where(valid, w, 0.0).astype(values.real.dtype)
    contrib = values[..., None] * w
    # route invalid corners to a dropped index
    flat_idx = jnp.where(valid, flat_idx, n**dims)
    flat = grid.reshape(-1)
    flat = jnp.concatenate([flat, jnp.zeros((1,), dtype=grid.dtype)])
    flat = flat.at[flat_idx.reshape(-1)].add(
        contrib.reshape(-1).astype(grid.dtype), mode="drop"
    )
    return flat[:-1].reshape(grid.shape)


def nearest_gather(grid, coords):
    dims = coords.shape[-1]
    n = grid.shape[-1]
    idx = jnp.rint(coords).astype(jnp.int32) + n // 2
    valid = jnp.all((idx >= 0) & (idx < n), axis=-1)
    flat_idx = jnp.zeros(coords.shape[:-1], dtype=jnp.int32)
    for d in range(dims):
        flat_idx = flat_idx * n + jnp.clip(idx[..., d], 0, n - 1)
    vals = jnp.take(grid.reshape(-1), flat_idx, axis=0)
    return jnp.where(valid, vals, 0)
