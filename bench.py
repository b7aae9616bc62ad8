"""Benchmark: particles/sec/chip for a demo-shaped 3D refine round.

Workload mirrors the reference demo (script/demo.json: 160 px box, pf 2)
mid-refinement: for each particle batch, project the reference at the scan
rotations, evaluate the factored pose likelihood over rotations x
translations with streaming log-sum-exp, pick best poses, and scatter the
batch into the band-cropped brick accumulators (ops/brick.py). This covers
the reference's E-step hot loops (src/Optimiser.cpp:622-1136) plus insertion
(src/Reconstructor.cpp:insertP), which dominate a refine round's wall clock.

vs_baseline compares against the self-measured reference-equivalent CPU
kernel harness (scripts/baseline_cpu/ -> BASELINE.md "measured" row),
normalized per chip vs per CPU core, since the reference publishes no
absolute numbers (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# measured reference row (BASELINE.md): particles/sec/core on the same
# workload shape, reference-equivalent C++ trilinear kernels, -O3 -mavx2
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")


def main():
    from thunder_tpu.core import projector, reconstructor
    from thunder_tpu.geom import quat
    from thunder_tpu.ops import likelihood, pixels
    from thunder_tpu.ops.translate import translation_phase
    from thunder_tpu.dtypes import real_dtype, device_complex

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

    # complex buffers cannot cross the axon host<->device boundary; build
    # them on device from real planes
    imgs = device_complex(
        (rng.normal(size=(n_imgs, p)) + 1j * rng.normal(size=(n_imgs, p))).astype(
            np.complex64
        )
    )
    ctf = jnp.asarray(rng.uniform(-1, 1, size=(n_imgs, p)).astype(np.float32))
    sig_rcp = jnp.asarray(
        (-0.5 / rng.uniform(0.5, 2, size=(n_imgs, p)).astype(np.float32))
    )

    # three jitted stages (compiling the fused step takes XLA > 10 min; the
    # real optimiser also runs these as separate programs)
    pmask_np = np.asarray(ring.mask, np.float32)

    @jax.jit
    def stage_project(vol):
        # bf16 rows halve the measured per-index gather cost (the step's
        # dominant op); interpolation dots accumulate f32 (ops/brick.py)
        tab = projector.build_brick_projectee_3d(
            vol, r_band, pf=pf, dtype=jnp.bfloat16)
        return projector.project_brick_3d(tab, rots, col, row, pf=pf)

    @jax.jit
    def stage_scan(imgs, ctf, sig_rcp, proj, tra):
        # fused Pallas/MXU kernel (ops/pallas_likelihood.py)
        out = likelihood.global_search_weights_fused(
            imgs, ctf, sig_rcp, proj[None], tra, pixel_mask=pmask_np
        )
        best_r = jnp.argmax(out["wR"][:, 0, :], axis=-1)
        best_t = jnp.argmax(out["wT"][:, 0, :], axis=-1)
        return best_r, best_t, out["baseline"]

    @jax.jit
    def stage_insert(imgs, ctf, rots_b, tra_b, baseline):
        state = reconstructor.empty_brick_state(n, r_band, pf=pf)
        state = reconstructor.insert_brick_3d(
            state, imgs * jnp.conj(tra_b), ctf, rots_b, col, row,
            jnp.ones(imgs.shape[0], real_dtype), pf=pf, pixel_mask=pmask,
        )
        f_c, t_c = reconstructor.finalize_brick(state)
        # real-valued output: the remote TPU backend cannot transfer
        # complex64 to host, and a host transfer is the only reliable sync
        return jnp.abs(f_c).sum() + t_c.sum() + baseline.sum()

    def refine_step():
        proj = stage_project(vol)
        best_r, best_t, baseline = stage_scan(imgs, ctf, sig_rcp, proj, tra)
        return stage_insert(imgs, ctf, rots[best_r], tra[best_t], baseline)

    # warmup/compile; float() forces a device->host sync (the only reliable
    # sync over the remote-TPU tunnel, which adds ~27 ms RTT per sync —
    # so amortize: n async dispatches, one sync, minus one dispatch+sync)
    float(refine_step())
    t0 = time.perf_counter()
    float(refine_step())
    t_one = time.perf_counter() - t0
    n_steps = 16
    t0 = time.perf_counter()
    r = None
    for _ in range(n_steps):
        r = refine_step()
    float(r)
    dt = max((time.perf_counter() - t0 - t_one) / (n_steps - 1), 1e-9)

    particles_per_sec = n_imgs / dt

    # matmul content of the step (for an MFU estimate, stderr only):
    # term2: B*P*(K*R); term1 per translation: 2 real matmuls B*P*(K*R)
    flops = 2 * n_imgs * p * n_rot * (1 + 2 * n_tr)
    mfu = flops / dt / 197e12  # v5e bf16 peak; f32 ~ 2x this fraction
    import sys

    print(
        f"step {dt*1e3:.1f} ms, matmul GFLOP {flops/1e9:.1f}, "
        f"MFU(bf16-peak) {mfu*100:.2f}%",
        file=sys.stderr,
    )

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        ref = base.get("particles_per_sec_per_core")
        if ref:
            vs_baseline = round(particles_per_sec / ref, 2)

    print(
        json.dumps(
            {
                "metric": "particles/sec/chip (3D refine E-step + insert, 160px, 1024x16 poses, 40-shell band) vs reference CPU particles/sec/core",
                "value": round(particles_per_sec, 2),
                "unit": "particles/s",
                "vs_baseline": vs_baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
