"""Component-level timing of the bench workload on the real chip.

NOTE: over the remote axon tunnel only a host transfer reliably syncs, so
every timed function must reduce to a real scalar and the timer calls
float() on it (block_until_ready is NOT trustworthy there)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from thunder_tpu.core import projector, reconstructor
from thunder_tpu.geom import quat
from thunder_tpu.ops import likelihood, pixels
from thunder_tpu.ops.translate import translation_phase
from thunder_tpu.dtypes import real_dtype, device_complex


def timeit(fn, *args, reps=4, name=""):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    float(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    n, pf = 160, 2
    n_imgs = 256
    n_rot, n_tr = 1024, 16
    r_band = 40

    rng = np.random.default_rng(0)
    ring = pixels.pixel_ring(n, 3, r_band)
    col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
    pmask = jnp.asarray(ring.mask)
    p = ring.n
    print(f"ring pixels P = {p} ({ring.n_real} real)")

    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    quats = quat.random_quat(jax.random.PRNGKey(0), n_rot)
    rots = quat.rotate3d(quats)
    trans = jnp.asarray(rng.normal(0, 3, size=(n_tr, 2)).astype(np.float32))
    tra = translation_phase(col, row, trans[:, 0], trans[:, 1], n)
    imgs = device_complex(
        (rng.normal(size=(n_imgs, p)) + 1j * rng.normal(size=(n_imgs, p))).astype(np.complex64))
    ctf = jnp.asarray(rng.uniform(-1, 1, size=(n_imgs, p)).astype(np.float32))
    sig_rcp = jnp.asarray((-0.5 / rng.uniform(0.5, 2, size=(n_imgs, p))).astype(np.float32))

    f_build = jax.jit(
        lambda v: projector.build_brick_projectee_3d(v, r_band, pf=pf))
    tab = f_build(vol)
    timeit(lambda v: f_build(v).sum(), vol,
           name="build_brick_projectee (pad+FFT+crop+pack)")

    timeit(jax.jit(lambda t, r: jnp.abs(
        projector.project_brick_3d(t, r, col, row, pf=pf)).sum()),
        tab, rots, name=f"brick projection ({n_rot} rots x {p} px)")

    proj = jax.jit(
        lambda t, r: projector.project_brick_3d(t, r, col, row, pf=pf))(tab, rots)

    timeit(jax.jit(lambda *a: likelihood.global_search_weights(
        *a, pixel_mask=pmask)["baseline"].sum()),
        imgs, ctf, sig_rcp, proj[None], tra,
        name=f"likelihood ({n_imgs} img x {n_rot}x{n_tr})")

    def f_ins(imgs, ctf, rots_b):
        state = reconstructor.empty_brick_state(n, r_band, pf=pf)
        state = reconstructor.insert_brick_3d(
            state, imgs, ctf, rots_b, col, row,
            jnp.ones(imgs.shape[0], real_dtype), pf=pf, pixel_mask=pmask)
        f_c, t_c = reconstructor.finalize_brick(state)
        return jnp.abs(f_c).sum() + t_c.sum()
    timeit(jax.jit(f_ins), imgs, ctf, rots[:n_imgs],
           name=f"brick insert+fold ({n_imgs} img)")


if __name__ == "__main__":
    main()
