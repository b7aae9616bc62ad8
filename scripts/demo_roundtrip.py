"""North-star quality + throughput measurement: the synthetic round-trip
oracle at demo shape (BASELINE.md "how to establish numbers", step 1;
reference tool pair appsrc/thunder_project.cpp + thunder_reconstruct.cpp).

Generates a C4-symmetric phantom at the demo box size, projects a particle
stack with known poses + CTF + noise (thunder_project semantics), runs the
full refinement from the ported demo config (configs/demo.json), and
reports:

- particles/sec/chip per FULL refinement iteration (with the per-stage
  breakdown from history),
- the FSC=0.143 resolution of the final map against the phantom.

Usage:
  python scripts/demo_roundtrip.py                 # demo shape on the chip
  python scripts/demo_roundtrip.py --size 48 --particles 64 --cpu  # smoke
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--particles", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--outdir", default="/tmp/demo_roundtrip")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--init-res", type=float, default=0.0,
                    help="override Initial Resolution (Angstrom)")
    ap.add_argument("--m-s", type=int, default=0,
                    help="override global sampling points")
    ap.add_argument("--image-batch", type=int, default=64)
    ap.add_argument("--fused", default="auto",
                    choices=("auto", "on", "off", "interpret"),
                    help="Pallas global-scan kernel switch (config "
                    "fused_kernels)")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest Meta_Round_*.thu in "
                    "--outdir (the reference's crash-recovery workflow: "
                    "Global Search false + stored poses)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax
    import jax.numpy as jnp

    from thunder_tpu.config import load_para
    from thunder_tpu.core import projector
    from thunder_tpu.core.optimiser import Optimiser
    from thunder_tpu.data import ParticleDataset
    from thunder_tpu.geom import quat
    from thunder_tpu.io import read_mrc, write_mrc
    from thunder_tpu.io.thu import make_table, write_thu
    from thunder_tpu.ops import ctf as ctf_ops
    from thunder_tpu.ops import fft as fft_ops
    from thunder_tpu.ops import spectrum
    from thunder_tpu.ops.mask import soft_mask_shape
    from thunder_tpu.ops.translate import translate_ft
    from thunder_tpu.utils import init_logger

    n, b = args.size, args.particles
    out = args.outdir
    os.makedirs(out, exist_ok=True)
    init_logger(out)
    para = load_para(os.path.join(os.path.dirname(__file__), "..",
                                  "configs", "demo.json"))
    para.size = n
    para.pixel_size = 1.32 * 160 / n  # keep the demo's physical box
    para.iter_max = args.iters
    para.c_search = False  # defocus search adds rounds; quality oracle off
    para.image_batch = args.image_batch
    para.output_directory = out
    para.save_ref_each_iter = False
    # per-round .thu checkpoints: a crashed run resumes with --resume
    # (saveTHUEachIter, the reference demo's default)
    para.save_thu_each_iter = True
    para.fused_kernels = args.fused
    if args.init_res:
        para.init_res = args.init_res
    if args.m_s:
        para.m_s = args.m_s

    import glob as _glob

    metas = sorted(_glob.glob(os.path.join(out, "Meta_Round_*.thu")))
    if args.resume and metas:
        _resume_run(args, para, out, metas[-1])
        return

    # ---- C4-symmetric phantom (the demo symmetry) ----
    # a few large blobs anchor the low frequencies; many FINE blobs
    # (sigma ~ 1.5-4 px) extend the phantom's spectrum toward Nyquist so
    # the truth-FSC oracle can actually measure high-resolution quality
    # (sigma >= 5 px blobs have no power beyond ~shell 15 at n=160 and
    # pinned the truth resolution at 14 A regardless of map quality)
    rng = np.random.default_rng(7)
    g = np.mgrid[:n, :n, :n].astype(np.float32) - n // 2
    vol = np.zeros((n, n, n), np.float32)
    for _ in range(6):
        c = rng.uniform(-n / 5, n / 5, 3)
        s = rng.uniform(n / 30, n / 12)
        vol += np.exp(-((g[0] - c[2]) ** 2 + (g[1] - c[1]) ** 2
                        + (g[2] - c[0]) ** 2) / (2 * s * s))
    for _ in range(40):
        c = rng.uniform(-n / 4, n / 4, 3)
        s = rng.uniform(1.5, 4.0)
        vol += 0.35 * np.exp(-((g[0] - c[2]) ** 2 + (g[1] - c[1]) ** 2
                               + (g[2] - c[0]) ** 2) / (2 * s * s))
    v = jnp.asarray(vol)
    r90 = jnp.rot90(v, 1, axes=(1, 2))
    vol = np.array(np.asarray((v + r90 + jnp.rot90(v, 2, axes=(1, 2))
                               + jnp.rot90(v, 3, axes=(1, 2))) / 4))
    vol *= np.asarray(soft_mask_shape((n, n, n), 0.45 * n, 4.0))
    write_mrc(os.path.join(out, "phantom.mrc"), vol,
              voxel_size=para.pixel_size)
    write_mrc(os.path.join(out, "init_model.mrc"), vol,
              voxel_size=para.pixel_size)
    para.init_model = os.path.join(out, "init_model.mrc")

    # ---- project the stack with known poses + CTF + noise ----
    q = np.asarray(quat.random_quat(jax.random.PRNGKey(1), b))
    tr = rng.normal(0, 2.0, (b, 2)).astype(np.float32)
    cp = dict(voltage=np.full(b, 300e3), defocus_u=rng.uniform(1e4, 2e4, b),
              defocus_v=rng.uniform(1e4, 2e4, b), defocus_theta=np.zeros(b),
              cs=np.zeros(b), amp_contrast=np.full(b, 0.1),
              phase_shift=np.zeros(b))
    cp = {k: v.astype(np.float32) for k, v in cp.items()}
    vf = projector.build_projectee_3d(jnp.asarray(vol), pf=2)
    f = jnp.arange(n) - n // 2
    colg, rowg = jnp.meshgrid(f, f, indexing="xy")
    colf = colg.reshape(-1).astype(jnp.float32)
    rowf = rowg.reshape(-1).astype(jnp.float32)
    chunks = []
    for s0 in range(0, b, 128):
        rots = quat.rotate3d(jnp.asarray(q[s0:s0 + 128]))
        sl = projector.project_full_3d(vf, rots, n, n // 2 - 1, pf=2)
        c2d = ctf_ops.ctf_pixels(
            colf, rowf, n, para.pixel_size,
            *[jnp.asarray(cp[k][s0:s0 + 128])[:, None] for k in
              ("voltage", "defocus_u", "defocus_v", "defocus_theta", "cs",
               "amp_contrast", "phase_shift")]).reshape(-1, n, n)
        sl = translate_ft(sl * c2d, jnp.asarray(tr[s0:s0 + 128, 0]),
                          jnp.asarray(tr[s0:s0 + 128, 1]))
        chunks.append(np.asarray(fft_ops.ifft2_center(sl).real, np.float32))
    stack = np.concatenate(chunks)
    stack += rng.normal(0, args.noise * stack.std(),
                        stack.shape).astype(np.float32)
    write_mrc(os.path.join(out, "stack.mrcs"), stack,
              voxel_size=para.pixel_size)
    table = make_table(
        b, particle_paths=[f"{i+1}@stack.mrcs" for i in range(b)],
        micrograph_paths=["none"] * b,
        voltage=cp["voltage"], defocus_u=cp["defocus_u"],
        defocus_v=cp["defocus_v"], defocus_theta=cp["defocus_theta"],
        cs=cp["cs"], amplitude_contrast=cp["amp_contrast"],
        phase_shift=cp["phase_shift"], group_id=np.ones(b, np.int32))
    write_thu(os.path.join(out, "particles.thu"), table)

    # ---- full refinement ----
    ds = ParticleDataset(os.path.join(out, "particles.thu"),
                         particle_prefix=out, seed=para.seed)
    opt = Optimiser(para)
    opt.set_data_from_dataset(ds)
    opt.init_reference(read_mrc(para.init_model))
    opt.init_sigma()
    t0 = time.perf_counter()
    history = opt.run(max_iter=args.iters)
    wall = time.perf_counter() - t0

    # ---- report ----
    joined = jnp.asarray(opt.joined_maps[0])
    fsc_truth = spectrum.frc_fsc(
        fft_ops.fft3_center(joined), fft_ops.fft3_center(jnp.asarray(vol)),
        n // 2, 3)
    res_shell = int(spectrum.res_p(fsc_truth, 0.143, r_low=1))
    res_a = n * para.pixel_size / max(res_shell, 1)
    # steady-state iteration = median of post-compile iterations
    iter_times = [sum(h["timing"].values()) for h in history]
    steady = float(np.median(iter_times[1:])) if len(iter_times) > 1 else \
        iter_times[0]
    print(json.dumps({
        "particles": b, "size": n, "iters": len(history),
        "wall_s": round(wall, 1),
        "steady_iter_s": round(steady, 2),
        "particles_per_sec_full_iter": round(b / steady, 2),
        "res_143_shell": res_shell, "res_143_A": round(res_a, 2),
        "nyquist_A": round(2 * para.pixel_size, 2),
        "final_internal_res_A": history[-1]["res_a"],
        "timing_last": {k: round(v, 2)
                        for k, v in history[-1]["timing"].items()},
        "n_phase_last": history[-1]["n_phase"],
    }))


def _resume_run(args, para, out, meta_path):
    """Continue a crashed run from its latest per-round checkpoint: the
    reference's resume workflow (Global Search: false + the stored pose
    columns, src/Optimiser.cpp:5312-5385)."""
    import re
    import numpy as np
    import jax.numpy as jnp

    from thunder_tpu.core.optimiser import Optimiser
    from thunder_tpu.data import ParticleDataset
    from thunder_tpu.io import read_mrc
    from thunder_tpu.io.thu import ThuColumns
    from thunder_tpu.ops import fft as fft_ops, spectrum

    done = int(re.search(r"Meta_Round_(\d+)", meta_path).group(1))
    print(f"resuming after round {done} from {meta_path}", flush=True)
    para.g_search = False
    ds = ParticleDataset(meta_path, particle_prefix=out, seed=para.seed)
    opt = Optimiser(para)
    opt.set_data_from_dataset(ds)
    q, tr, d, cls = ds.poses()
    t = ds.table
    opt.load_poses(
        q, tr, d, cls,
        k123=(t.col(ThuColumns.K1), t.col(ThuColumns.K2),
              t.col(ThuColumns.K3)),
        std_t=(t.col(ThuColumns.STD_TRANSLATION_X),
               t.col(ThuColumns.STD_TRANSLATION_Y)))
    # latest saved half maps (if any) beat the initial model
    import glob as _glob
    refs = sorted(_glob.glob(os.path.join(out, "Reference_000_A_Round_*.mrc")))
    if refs:
        a = read_mrc(refs[-1])
        b_m = read_mrc(refs[-1].replace("_A_", "_B_"))
        opt.init_reference((a + b_m) / 2)
    else:
        # config paths are relative to the run directory
        p = para.init_model
        if not os.path.isabs(p):
            p = os.path.join(out, p)
        opt.init_reference(read_mrc(p))
    opt.iteration = done
    opt.init_sigma()
    t0 = time.perf_counter()
    history = opt.run(max_iter=max(1, args.iters - done))
    wall = time.perf_counter() - t0

    vol = read_mrc(os.path.join(out, "phantom.mrc"))
    joined = jnp.asarray(opt.joined_maps[0])
    n = para.size
    fsc_truth = spectrum.frc_fsc(
        fft_ops.fft3_center(joined), fft_ops.fft3_center(jnp.asarray(vol)),
        n // 2, 3)
    res_shell = int(spectrum.res_p(fsc_truth, 0.143, r_low=1))
    res_a = n * para.pixel_size / max(res_shell, 1)
    iter_times = [sum(h["timing"].values()) for h in history]
    steady = float(np.median(iter_times[1:])) if len(iter_times) > 1 else \
        iter_times[0]
    print(json.dumps({
        "resumed_after_round": done,
        "particles": args.particles, "size": n, "iters": len(history),
        "wall_s": round(wall, 1),
        "steady_iter_s": round(steady, 2),
        "particles_per_sec_full_iter": round(args.particles / steady, 2),
        "res_143_shell": res_shell, "res_143_A": round(res_a, 2),
        "nyquist_A": round(2 * para.pixel_size, 2),
        "final_internal_res_A": history[-1]["res_a"],
        "timing_last": {k: round(v, 2)
                        for k, v in history[-1]["timing"].items()},
        "n_phase_last": history[-1]["n_phase"],
    }))


if __name__ == "__main__":
    main()
