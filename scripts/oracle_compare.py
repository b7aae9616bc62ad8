"""Map-level quality parity vs the reference-faithful C++ oracle (r5).

The reference binary needs >= 3 MPI ranks (appsrc/thunder.cpp:403) and the
image has no MPI toolchain, so parity is measured against
scripts/baseline_cpu/oracle.cpp — an independent C++ implementation of the
reference's reconstruction algorithm built from its formulas.

Both codes consume IDENTICAL inputs (phantom + poses written here), each
projects with its own trilinear central-slice projector, inserts, and runs
the full Wiener/C-balance reconstruction; the FSC between the two final
maps measures end-to-end agreement of the reconstruction stacks.

Run (CPU): python scripts/oracle_compare.py
Prints per-shell FSC and the 0.999/0.99 crossing shells; a row for
BASELINE.md.
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 64
N_POSE = 384
PF = 2


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from thunder_tpu.core import projector, reconstructor
    from thunder_tpu.geom import quat
    from thunder_tpu.ops import fft as fft_ops, pixels, spectrum

    here = os.path.dirname(os.path.abspath(__file__))
    work = "/tmp/oracle_cmp"
    os.makedirs(work, exist_ok=True)

    # deterministic phantom: blobs + white texture so EVERY shell carries
    # signal (a smooth blob phantom runs out of spectral power by ~1/3 of
    # the band and the top-shell FSC then compares interpolation noise)
    rng = np.random.default_rng(11)
    g = np.mgrid[:N, :N, :N].astype(np.float64) - N // 2
    vol = np.zeros((N, N, N))
    for _ in range(10):
        c = rng.uniform(-N / 5, N / 5, 3)
        s = rng.uniform(N / 40, N / 12)
        vol += rng.uniform(0.5, 1.5) * np.exp(
            -((g[0] - c[2]) ** 2 + (g[1] - c[1]) ** 2 + (g[2] - c[0]) ** 2)
            / (2 * s * s))
    vol = (vol + 0.5 * rng.normal(size=vol.shape)).astype(np.float32)
    q = np.asarray(quat.random_quat(jax.random.PRNGKey(4), N_POSE))
    rots = np.asarray(quat.rotate3d(jnp.asarray(q)), np.float64)

    vol.tofile(os.path.join(work, "phantom.raw"))
    with open(os.path.join(work, "poses.txt"), "w") as f:
        for r in rots:
            f.write(" ".join(f"{v:.17g}" for v in r.reshape(-1)) + "\n")

    # ---- C++ oracle
    exe = os.path.join(here, "baseline_cpu", "oracle")
    if (not os.path.exists(exe)
            or os.path.getmtime(exe) < os.path.getmtime(
                os.path.join(here, "baseline_cpu", "oracle.cpp"))):
        subprocess.check_call(
            ["g++", "-O2", "-o", exe,
             os.path.join(here, "baseline_cpu", "oracle.cpp")])
    subprocess.check_call(
        [exe, os.path.join(work, "phantom.raw"), str(N),
         os.path.join(work, "poses.txt"), os.path.join(work, "ref.raw")])
    ref_map = np.fromfile(os.path.join(work, "ref.raw"),
                          np.float32).reshape(N, N, N)

    # ---- our production path: brick insert + cropped reconstruction
    max_r = N // 2 - 2
    vf = projector.build_projectee_3d(jnp.asarray(vol), pf=PF)
    ring = pixels.pixel_ring(N, 0, max_r)
    col, row = jnp.asarray(ring.col), jnp.asarray(ring.row)
    pm = jnp.asarray(ring.mask)
    st = reconstructor.empty_brick_state(N, max_r, pf=PF)
    rots_j = jnp.asarray(rots.astype(np.float32))
    for s in range(0, N_POSE, 64):
        sl = slice(s, min(s + 64, N_POSE))
        proj = projector.project_pixels_3d(vf, rots_j[sl], col, row, pf=PF)
        st = reconstructor.insert_brick_3d(
            st, proj, jnp.ones_like(proj.real), rots_j[sl], col, row,
            jnp.ones(sl.stop - sl.start), pf=PF, pixel_mask=pm)
    f_c, t_c = reconstructor.finalize_brick(st)
    ours = np.asarray(reconstructor.reconstruct_cropped(
        f_c, t_c, jnp.ones((N // 2,)), N, pf=PF, max_radius=max_r, dims=3))

    # ---- compare
    fa = fft_ops.fft3_center(jnp.asarray(ours))
    fb = fft_ops.fft3_center(jnp.asarray(ref_map))
    fsc = np.asarray(spectrum.frc_fsc(fa, fb, N // 2, 3))
    tr_fsc = np.asarray(spectrum.frc_fsc(
        fa, fft_ops.fft3_center(jnp.asarray(vol)), N // 2, 3))
    ref_tr = np.asarray(spectrum.frc_fsc(
        fb, fft_ops.fft3_center(jnp.asarray(vol)), N // 2, 3))
    print("shell  FSC(ours,ref)  FSC(ours,truth)  FSC(ref,truth)")
    for i in range(1, max_r):
        print(f"{i:4d}  {fsc[i]:12.6f}  {tr_fsc[i]:13.6f}  {ref_tr[i]:13.6f}")
    band = fsc[1:max_r - 1]
    print(f"\nmin FSC(ours, reference-faithful oracle) over shells "
          f"[1, {max_r - 1}): {band.min():.6f}")
    print(f"mean: {band.mean():.6f}")
    # the last two shells sit on the inserted-band boundary where the two
    # implementations' grid margins differ by construction (band-cropped
    # brick grid vs full padded grid); interior shells must agree tightly
    # and the truth-FSC curves must track each other everywhere
    ok = (band[:-2].min() > 0.96 and band.min() > 0.9
          and np.max(np.abs(tr_fsc[1:max_r - 1] - ref_tr[1:max_r - 1]))
          < 0.06)
    print("PARITY", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
