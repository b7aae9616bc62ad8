"""Benchmark: particles/sec/chip for a demo-shaped 3D refine round.

Workload mirrors the reference demo (script/demo.json: 160 px box, pf 2)
mid-refinement: for each particle batch, project the reference at the scan
rotations, evaluate the factored pose likelihood over rotations x
translations with streaming log-sum-exp, pick best poses, and scatter the
batch into the padded F/T volumes. This covers the reference's E-step hot
loops (src/Optimiser.cpp:622-1136) plus insertion (src/Reconstructor.cpp:
insertP), which dominate a refine round's wall clock.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from thunder_tpu.core import projector, reconstructor
    from thunder_tpu.geom import quat
    from thunder_tpu.ops import likelihood, pixels
    from thunder_tpu.ops.translate import translation_phase
    from thunder_tpu.dtypes import real_dtype

    n, pf = 160, 2
    n_imgs = 256          # particles per step
    n_rot, n_tr = 1024, 16  # scan poses per particle
    r_band = 40           # mid-refinement frequency band (shells)

    rng = np.random.default_rng(0)
    ring = pixels.pixel_ring(n, 3, r_band)
    col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
    pmask = jnp.asarray(ring.mask)
    p = ring.n

    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    quats = quat.random_quat(jax.random.PRNGKey(0), n_rot)
    rots = quat.rotate3d(quats)
    trans = jnp.asarray(rng.normal(0, 3, size=(n_tr, 2)).astype(np.float32))
    tra = translation_phase(col, row, trans[:, 0], trans[:, 1], n)
    from thunder_tpu.dtypes import device_complex

    # complex buffers cannot cross the axon host<->device boundary; build
    # them on device from real planes
    imgs = device_complex(
        (rng.normal(size=(n_imgs, p)) + 1j * rng.normal(size=(n_imgs, p))).astype(
            np.complex64
        )
    )
    ctf = jnp.asarray(rng.uniform(-1, 1, size=(n_imgs, p)).astype(np.float32))
    sig_rcp = jnp.asarray(
        (-0.5 / rng.uniform(0.5, 2, size=(n_imgs, p))).astype(np.float32)
    )

    @jax.jit
    def refine_step(vol, imgs, ctf, sig_rcp, rots, tra, col, row, pmask):
        ref_ft = projector.build_projectee_3d(vol, pf=pf)
        proj = projector.project_pixels_3d(ref_ft, rots, col, row, pf=pf)
        out = likelihood.global_search_weights(
            imgs, ctf, sig_rcp, proj[None], tra, pixel_mask=pmask
        )
        best_r = jnp.argmax(out["wR"][:, 0, :], axis=-1)
        best_t = jnp.argmax(out["wT"][:, 0, :], axis=-1)
        state = reconstructor.empty_state(n, pf=pf)
        state = reconstructor.insert_pixels_3d(
            state, imgs * jnp.conj(tra[best_t]), ctf, rots[best_r], col, row,
            jnp.ones(imgs.shape[0], real_dtype), pf=pf, pixel_mask=pmask,
        )
        # real-valued output: the remote TPU backend cannot transfer
        # complex64 to host, and a host transfer is the only reliable sync
        return jnp.abs(state["F"]).sum() + out["baseline"].sum()

    args = (vol, imgs, ctf, sig_rcp, rots, tra, col, row, pmask)
    # warmup/compile; float() forces a device->host sync (the only reliable
    # sync over the remote-TPU tunnel, which adds ~27 ms RTT per sync —
    # so amortize: n async dispatches, one sync, minus one dispatch+sync)
    float(refine_step(*args))
    t0 = time.perf_counter()
    float(refine_step(*args))
    t_one = time.perf_counter() - t0
    n_steps = 16
    t0 = time.perf_counter()
    r = None
    for _ in range(n_steps):
        r = refine_step(*args)
    float(r)
    dt = max((time.perf_counter() - t0 - t_one) / (n_steps - 1), 1e-9)

    particles_per_sec = n_imgs / dt
    print(
        json.dumps(
            {
                "metric": "particles/sec/chip (3D refine E-step + insert, 160px, 1024x16 poses, 40-shell band)",
                "value": round(particles_per_sec, 2),
                "unit": "particles/s",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
