"""Does a 3D-blocked table layout cut the big-table gather cost?

take cost measured ~15 ns/idx on the 144 MB demo table with real slice
coords, but ~5.5-8 ns when the working set is cache-resident. Slice
samples step ~2 voxels along a line, i.e. they ARE 3D-local — a row-major
table turns that into ±2*mc^2-row address jumps. A 4x4x4-blocked layout
(row = block_id * 64 + offset-in-block) makes 3D-local samples
address-local with zero size overhead.

Times, on the real chip, with REAL slice coords at the bench shape:
  flat-rand   — uniform-random idx (upper bound of badness)
  flat-slice  — row-major layout, slice-access pattern (current engine)
  block-slice — 4x4x4-blocked layout, same samples
  shell-sort  — row-major layout, pixels sorted by shell
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from thunder_tpu.core import projector
    from thunder_tpu.geom import quat

    b, R, P, mc, n = 64, 125, 4096, 165, 160
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    n_idx = b * R * P

    q = quat.random_quat(key, b * R).reshape(b, R, 4)
    fr = np.arange(n) - n // 2
    cg, rg = np.meshgrid(fr, fr, indexing="xy")
    r2 = (cg ** 2 + rg ** 2).reshape(-1)
    sel = np.argsort(r2)[:P]
    col = cg.reshape(-1)[sel].astype(np.float32)
    row = rg.reshape(-1)[sel].astype(np.float32)
    # shell-sorted variant: sort the selected pixels by shell radius
    order = np.argsort(np.rint(np.sqrt(r2[sel])), kind="stable")
    col_s, row_s = col[order], row[order]

    rots = quat.rotate3d(jnp.asarray(q))
    coords = np.asarray(projector.slice_coords_3d(
        rots, jnp.asarray(col), jnp.asarray(row), pf=2))
    coords_s = np.asarray(projector.slice_coords_3d(
        rots, jnp.asarray(col_s), jnp.asarray(row_s), pf=2))

    def flat_idx(c):
        bi = np.floor(c).astype(np.int32) + mc // 2
        bi = np.clip(bi, 0, mc - 2)
        return (bi[..., 0] * mc + bi[..., 1]) * mc + bi[..., 2]

    def block_idx(c, bs=4):
        nb = -(-mc // bs)
        bi = np.floor(c).astype(np.int32) + mc // 2
        bi = np.clip(bi, 0, mc - 2)
        bz, oz = bi[..., 0] // bs, bi[..., 0] % bs
        by, oy = bi[..., 1] // bs, bi[..., 1] % bs
        bx, ox = bi[..., 2] // bs, bi[..., 2] % bs
        blk = (bz * nb + by) * nb + bx
        off = (oz * bs + oy) * bs + ox
        return blk * (bs ** 3) + off, nb ** 3 * bs ** 3

    n_rows = mc ** 3
    tab = jnp.asarray(rng.normal(size=(n_rows, 8)).astype(np.float32))

    variants = {}
    variants["flat-rand"] = (
        rng.integers(0, n_rows, size=n_idx).astype(np.int32), n_rows)
    variants["flat-slice"] = (flat_idx(coords).reshape(-1), n_rows)
    bidx, brows = block_idx(coords)
    variants["block-slice"] = (bidx.reshape(-1), brows)
    variants["shell-sort"] = (flat_idx(coords_s).reshape(-1), n_rows)

    for name, (idx, rows) in variants.items():
        tabv = (tab if rows == n_rows
                else jnp.asarray(rng.normal(size=(rows, 8))
                                 .astype(np.float32)))
        idxv = jnp.asarray(idx)

        @jax.jit
        def f(tabv, idxv, salt, nr):
            # +salt keeps repeat executions distinct without changing the
            # access pattern
            rows_ = jnp.take(tabv, jnp.minimum(idxv + salt, nr - 1), axis=0)
            return jnp.sum(rows_[:, 0])

        float(f(tabv, idxv, 0, rows))
        ts = []
        for i in range(1, 4):
            t0 = time.perf_counter()
            float(f(tabv, idxv, i, rows))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"[layout] {name:<11} {t * 1e3:7.1f} ms  "
              f"{t / n_idx * 1e9:6.2f} ns/idx  (rows={rows})", flush=True)


if __name__ == "__main__":
    main()
