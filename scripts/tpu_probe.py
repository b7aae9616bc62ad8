"""One-process TPU timing probe: where does a refine round's time go?

Times each component of the demo-shaped workload (160 px box, pf 2,
1024 rotations x 16 translations, 40-shell band, 256 particles) plus a
pure-matmul roofline reference. Prints one JSON line per component.

Run on the real chip:  python scripts/tpu_probe.py
Run on CPU (sanity):   JAX_PLATFORMS=cpu python scripts/tpu_probe.py --small
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=1):
    # fn must return a real scalar: on the axon remote backend a
    # device->host transfer is the only reliable sync (block_until_ready
    # returns before remote execution completes). The tunnel adds ~27 ms
    # RTT per sync, so amortize: n async dispatches, one sync, minus the
    # measured single-dispatch+sync time.
    for _ in range(warmup):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from thunder_tpu.core import projector, reconstructor
    from thunder_tpu.geom import quat
    from thunder_tpu.ops import likelihood, pixels
    from thunder_tpu.ops.translate import translation_phase
    from thunder_tpu.dtypes import real_dtype, device_complex

    if args.small:
        n, pf, n_imgs, n_rot, n_tr, r_band = 64, 2, 32, 128, 8, 20
    else:
        n, pf, n_imgs, n_rot, n_tr, r_band = 160, 2, 256, 1024, 16, 40

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}),
          flush=True)

    rng = np.random.default_rng(0)
    ring = pixels.pixel_ring(n, 3, r_band)
    # keep index arrays host-side; jit args only (axon: no constant embedding)
    col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
    pmask = jnp.asarray(ring.mask)
    p = ring.n
    print(json.dumps({"ring_pixels": int(p)}), flush=True)

    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    quats = quat.random_quat(jax.random.PRNGKey(0), n_rot)
    rots = quat.rotate3d(quats)
    trans = jnp.asarray(rng.normal(0, 3, size=(n_tr, 2)).astype(np.float32))
    tra = translation_phase(col, row, trans[:, 0], trans[:, 1], n)
    imgs = device_complex(
        (rng.normal(size=(n_imgs, p)) + 1j * rng.normal(size=(n_imgs, p))
         ).astype(np.complex64))
    ctf = jnp.asarray(rng.uniform(-1, 1, size=(n_imgs, p)).astype(np.float32))
    sig_rcp = jnp.asarray(
        (-0.5 / rng.uniform(0.5, 2, size=(n_imgs, p))).astype(np.float32))

    def report(name, dt, flops=None, note=""):
        rec = {"component": name, "ms": round(dt * 1e3, 3)}
        if flops:
            rec["tflops"] = round(flops / dt / 1e12, 2)
        if note:
            rec["note"] = note
        print(json.dumps(rec), flush=True)

    # 0. pure matmul roofline (f32 and bf16)
    m_dim = 4096
    a = jnp.asarray(rng.normal(size=(m_dim, m_dim)).astype(np.float32))
    mm = jax.jit(lambda a: (a @ a).sum())
    report("matmul_f32_4096", timeit(mm, a), flops=2 * m_dim**3)
    ab = a.astype(jnp.bfloat16)
    mmb = jax.jit(
        lambda a: jnp.dot(a, a, preferred_element_type=jnp.float32).sum())
    report("matmul_bf16_4096", timeit(mmb, ab), flops=2 * m_dim**3)

    # 1. build projectee (pad + grid correct + 3D FFT at (pf n)^3)
    build = jax.jit(lambda v: jnp.abs(projector.build_projectee_3d(v, pf=pf)).sum())
    report("build_projectee", timeit(build, vol, n=10))

    ref_ft = jax.jit(lambda v: projector.build_projectee_3d(v, pf=pf))(vol)
    jax.block_until_ready(ref_ft)

    # 2. projection gather: n_rot slices x p pixels
    proj_fn = jax.jit(
        lambda f, r, c, w: jnp.abs(
            projector.project_pixels_3d(f, r, c, w, pf=pf)).sum())
    report("project_gather", timeit(proj_fn, ref_ft, rots, col, row),
           note=f"{n_rot}x{p} px, 8-corner gather from {(pf*n)**3 // 1_000_000}M vox")

    proj = jax.jit(
        lambda f, r, c, w: projector.project_pixels_3d(f, r, c, w, pf=pf))(
        ref_ft, rots, col, row)
    jax.block_until_ready(proj)

    # 3. likelihood (global scan)
    lik = jax.jit(lambda d, c, s, pr, tr, pm: likelihood.global_search_weights(
        d, c, s, pr[None], tr, pixel_mask=pm)["baseline"].sum())
    dt = timeit(lik, imgs, ctf, sig_rcp, proj, tra, pmask)
    flops = 2 * 2 * n_imgs * p * n_rot * (n_tr + 0.5)  # term1 per t + term2
    report("likelihood_global", dt, flops=flops)

    # 4. scatter insert (256 imgs, best pose each)
    w = jnp.ones(n_imgs, real_dtype)

    def ins(dat, c, r, cl, rw, wt, pm):
        st = reconstructor.empty_state(n, pf=pf)
        st = reconstructor.insert_pixels_3d(st, dat, c, r, cl, rw, wt, pf=pf,
                                            pixel_mask=pm)
        return jnp.abs(st["F"]).sum() + st["T"].sum()

    rimg = rots[jnp.arange(n_imgs) % n_rot]
    report("scatter_insert",
           timeit(jax.jit(ins), imgs, ctf, rimg, col, row, w, pmask, n=10),
           note=f"{n_imgs}x{p}x2 herm x 8 corners")

    # 5. reconstruct (C-balance loop + FFTs at (pf n)^3)
    st = reconstructor.empty_state(n, pf=pf)
    st = jax.jit(lambda s, d, c, r, cl, rw, wt, pm: reconstructor.insert_pixels_3d(
        s, d, c, r, cl, rw, wt, pf=pf, pixel_mask=pm))(
        st, imgs, ctf, rimg, col, row, w, pmask)
    fsc = jnp.ones((n // 2,), real_dtype)
    rec_fn = jax.jit(lambda f, t, q: jnp.abs(reconstructor.reconstruct(
        f, t, q, n, pf=pf)).sum())
    report("reconstruct_full", timeit(rec_fn, st["F"], st["T"], fsc, n=6),
           note="C-balance <=30 iters + grid corr")

    # 6. 3D FFT at padded size
    fvol = jnp.asarray(rng.normal(size=(pf * n,) * 3).astype(np.float32))
    fft3 = jax.jit(lambda v: jnp.abs(jnp.fft.fftn(v)).sum())
    report("fft3_320", timeit(fft3, fvol, n=3))


if __name__ == "__main__":
    main()
