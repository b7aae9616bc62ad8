"""CLI toolchain: project -> reconstruct round trip, postprocess, filters,
and STAR interop, all through the command-line entry points."""

import numpy as np
import jax.numpy as jnp
import pytest

from thunder_tpu.cli.main import main as cli
from thunder_tpu.io import read_mrc, write_mrc
from thunder_tpu.io.thu import make_table, read_thu, write_thu

# heavy e2e fixtures: deselect with -m 'not slow' for the fast unit path
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    n = 32
    g = np.mgrid[:n, :n, :n] - n // 2
    blob = lambda c, s: np.exp(
        -((g[0] - c[0]) ** 2 + (g[1] - c[1]) ** 2 + (g[2] - c[2]) ** 2) / (2 * s**2)
    )
    v = (blob((0, 4, 2), 2.5) + 0.8 * blob((3, -4, -2), 2.0)).astype(np.float32)
    write_mrc(str(d / "phantom.mrc"), v, voxel_size=1.32)
    rng = np.random.default_rng(0)
    q = rng.normal(size=(48, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t = make_table(
        48,
        particle_paths=[f"{i+1}@{d}/stack.mrcs" for i in range(48)],
        quat_0=q[:, 0], quat_1=q[:, 1], quat_2=q[:, 2], quat_3=q[:, 3],
        translation_x=rng.normal(0, 1, 48), translation_y=rng.normal(0, 1, 48),
    )
    write_thu(str(d / "poses.thu"), t)
    return d, v


def test_project_reconstruct_roundtrip(workdir):
    d, vol = workdir
    cli(["project", str(d / "phantom.mrc"), str(d / "poses.thu"),
         str(d / "stack.mrcs"), "--pixel-size", "1.32"])
    cli(["reconstruct", str(d / "poses.thu"), str(d / "recon.mrc"),
         "--pixel-size", "1.32"])
    rec = read_mrc(str(d / "recon.mrc"))
    from thunder_tpu.ops import fft, spectrum

    fsc = np.asarray(
        spectrum.frc_fsc(
            fft.fft3_center(jnp.asarray(vol)), fft.fft3_center(jnp.asarray(rec)),
            16, 3,
        )
    )
    assert np.all(fsc[1:8] > 0.8), fsc


def test_postprocess_cli(workdir):
    d, _ = workdir
    cli(["genmask", str(d / "phantom.mrc"), str(d / "mask.mrc")])
    cli(["postprocess", str(d / "phantom.mrc"), str(d / "recon.mrc"),
         str(d / "post.mrc"), "--mask", str(d / "mask.mrc"),
         "--fsc", str(d / "fsc.txt")])
    lines = open(d / "fsc.txt").read().splitlines()
    assert len(lines) == 16
    assert read_mrc(str(d / "post.mrc")).shape == (32, 32, 32)


def test_filters_cli(workdir):
    d, _ = workdir
    cli(["lowpass", str(d / "phantom.mrc"), str(d / "lp.mrc"),
         "--resolution", "5"])
    cli(["resize", str(d / "phantom.mrc"), str(d / "big.mrc"), "--size", "48"])
    assert read_mrc(str(d / "big.mrc")).shape == (48, 48, 48)
    cli(["bfactor", str(d / "phantom.mrc"), str(d / "bf.mrc"),
         "--bfactor", "200"])
    cli(["minus", str(d / "phantom.mrc"), str(d / "lp.mrc"), str(d / "hi.mrc")])
    # lowpass + its complement reconstruct the original
    lp = read_mrc(str(d / "lp.mrc"))
    hi = read_mrc(str(d / "hi.mrc"))
    orig = read_mrc(str(d / "phantom.mrc"))
    np.testing.assert_allclose(lp + hi, orig, atol=1e-5)


def test_star_interop(workdir):
    d, _ = workdir
    cli(["thu2star", str(d / "poses.thu"), str(d / "poses.star")])
    cli(["star2thu", str(d / "poses.star"), str(d / "back.thu")])
    orig = read_thu(str(d / "poses.thu"))
    back = read_thu(str(d / "back.thu"))
    assert len(back) == len(orig)
    from thunder_tpu.io.thu import ThuColumns

    np.testing.assert_allclose(
        back.col(ThuColumns.VOLTAGE), orig.col(ThuColumns.VOLTAGE), rtol=1e-6
    )
    np.testing.assert_allclose(
        back.col(ThuColumns.CS), orig.col(ThuColumns.CS), rtol=1e-5
    )


def test_select_gallery_and_keep(tmp_path):
    """thunder_stackview replacement: gallery from a class-average stack +
    class-filtered .thu (gui/thunder_stackview/, README.md:37-47)."""
    k, n, b = 4, 16, 40
    rng = np.random.default_rng(3)
    stack = rng.normal(size=(k, n, n)).astype(np.float32)
    write_mrc(str(tmp_path / "classes.mrcs"), stack, voxel_size=2.0)
    cls = np.asarray([i % k for i in range(b)])
    t = make_table(b,
                   particle_paths=[f"{i+1}@s.mrcs" for i in range(b)],
                   class_id=cls)
    write_thu(str(tmp_path / "meta.thu"), t)
    out_html = str(tmp_path / "gallery.html")
    cli(["select", str(tmp_path / "classes.mrcs"), out_html,
         "--thu", str(tmp_path / "meta.thu"), "--keep", "0,2-3",
         "--keep-output", str(tmp_path / "kept.thu")])
    html = open(out_html).read()
    assert html.count("data:image/bmp;base64,") == k
    assert "class 3" in html
    kept = read_thu(str(tmp_path / "kept.thu"))
    from thunder_tpu.io.thu import ThuColumns

    kc = kept.col(ThuColumns.CLASS_ID).astype(int)
    assert len(kept) == int(np.isin(cls, [0, 2, 3]).sum())
    assert set(kc) == {0, 2, 3}
    # kept rows preserve their original particle paths
    orig = [p for p, c in zip(t.particle_paths, cls) if c in (0, 2, 3)]
    assert kept.particle_paths == orig
    # the gallery is interactive: selection JS + exportable keep list
    assert "Export keep list" in html and "function tog(" in html
    # --keep-file round-trips the browser's exported keep.txt
    (tmp_path / "keep.txt").write_text("0,2,3\n")
    cli(["select", str(tmp_path / "classes.mrcs"), out_html,
         "--thu", str(tmp_path / "meta.thu"),
         "--keep-file", str(tmp_path / "keep.txt"),
         "--keep-output", str(tmp_path / "kept2.thu")])
    kept2 = read_thu(str(tmp_path / "kept2.thu"))
    assert kept2.particle_paths == orig


def test_run_end_to_end(tmp_path):
    """The `run` subcommand end to end (appsrc/thunder.cpp:346-488):
    config JSON -> dataset -> refinement -> outputs, then a RESUME run
    (Global Search: false) from the produced Meta_Final.thu."""
    import json

    import jax
    from thunder_tpu.core import projector
    from thunder_tpu.geom import quat
    from thunder_tpu.ops import ctf as ctf_ops, fft as fft_ops
    from thunder_tpu.ops.translate import translate_ft
    from thunder_tpu.ops.filters import low_pass_filter

    n, b = 32, 48
    rng = np.random.default_rng(5)
    g = np.mgrid[:n, :n, :n].astype(np.float32) - n // 2
    vol = np.zeros((n, n, n), np.float32)
    for _ in range(4):
        c = rng.uniform(-n / 5, n / 5, 3)
        s = rng.uniform(n / 16, n / 9)
        vol += np.exp(-((g[0] - c[2]) ** 2 + (g[1] - c[1]) ** 2
                        + (g[2] - c[0]) ** 2) / (2 * s * s))
    q = np.asarray(quat.random_quat(jax.random.PRNGKey(2), b))
    tr = rng.normal(0, 1.0, (b, 2)).astype(np.float32)
    du = rng.uniform(1e4, 2e4, b).astype(np.float32)
    # project + CTF + translate (the stack the run's CTF model expects)
    vf = projector.build_projectee_3d(jnp.asarray(vol), pf=2)
    f = jnp.arange(n) - n // 2
    colg, rowg = jnp.meshgrid(f, f, indexing="xy")
    c2d = ctf_ops.ctf_pixels(
        colg.reshape(-1).astype(jnp.float32),
        rowg.reshape(-1).astype(jnp.float32), n, 1.32,
        jnp.full((b, 1), 300e3), jnp.asarray(du)[:, None],
        jnp.asarray(du)[:, None], jnp.zeros((b, 1)), jnp.zeros((b, 1)),
        jnp.full((b, 1), 0.1), jnp.zeros((b, 1))).reshape(b, n, n)
    sl = projector.project_full_3d(
        vf, quat.rotate3d(jnp.asarray(q)), n, n // 2 - 1, pf=2)
    sl = translate_ft(sl * c2d, jnp.asarray(tr[:, 0]), jnp.asarray(tr[:, 1]))
    stack = np.array(fft_ops.ifft2_center(sl).real, np.float32)
    stack += rng.normal(0, stack.std(), stack.shape).astype(np.float32)
    write_mrc(str(tmp_path / "stack.mrcs"), stack, voxel_size=1.32)
    t = make_table(
        b, particle_paths=[f"{i+1}@{tmp_path}/stack.mrcs" for i in range(b)],
        voltage=np.full(b, 300e3), defocus_u=du, defocus_v=du,
        amplitude_contrast=np.full(b, 0.1))
    write_thu(str(tmp_path / "particles.thu"), t)
    init = np.asarray(fft_ops.ifft3_center(low_pass_filter(
        fft_ops.fft3_center(jnp.asarray(vol)), 4.0 / n, 3.0 / n, 3)).real)
    write_mrc(str(tmp_path / "init.mrc"), init, voxel_size=1.32)

    cfg = {
        "Basic": {
            "2D or 3D Mode": "3D",
            "Global Search": True, "Local Search": True, "CTF Search": False,
            "Number of Classes": 1, "Size of Image": n,
            "Pixel Size (Angstrom)": 1.32,
            "Radius of Mask on Images (Angstrom)": 16.0,
            "Estimated Translation (Pixel)": 2,
            "Initial Resolution (Angstrom)": 12.0,
            "Perform Global Search Under (Angstrom)": 6.0,
            "Symmetry": "C1",
            "Initial Model": str(tmp_path / "init.mrc"),
            ".thu File Storing Paths and CTFs of Images":
                str(tmp_path / "particles.thu"),
            "Path of Output": str(tmp_path / "out"),
            "Prefix of Output": "",
        },
        "Advanced": {
            "Max Number of Iteration": 2,
            "Padding Factor": 2,
            "Number of Sampling Points for Scanning in Global Search (3D)": 128,
            "Number of Sampling Points of Rotation in Local Search (3D)": 15,
            "Number of Sampling Points of Translation in Local Search": 5,
            "Number of Sampling Points of Defocus in Local Search": 3,
            "Number of Sampling Points Used in Reconstruction": 10,
            "Save Reference(s) Each Iteration": False,
            "Save .thu File Each Iteration": False,
        },
    }
    cfg_path = tmp_path / "run.json"
    cfg_path.write_text(json.dumps(cfg))
    cli(["run", str(cfg_path)])
    out = tmp_path / "out"
    assert (out / "Reference_000_A_Final.mrc").exists()
    assert (out / "Reference_000_B_Final.mrc").exists()
    assert (out / "Reference_000_Final.mrc").exists()
    assert (out / "FSC_Final.txt").exists()
    meta = read_thu(str(out / "Meta_Final.thu"))
    assert len(meta) == b
    # quaternions in the meta table are unit-norm (refined poses persisted)
    qn = np.linalg.norm(meta.values[:, 13:17], axis=1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)

    # ---- resume: Global Search false from the produced .thu
    cfg["Basic"]["Global Search"] = False
    cfg["Basic"][".thu File Storing Paths and CTFs of Images"] = str(
        out / "Meta_Final.thu")
    cfg["Basic"]["Path of Output"] = str(tmp_path / "out2")
    cfg["Advanced"]["Max Number of Iteration"] = 1
    cfg2 = tmp_path / "resume.json"
    cfg2.write_text(json.dumps(cfg))
    cli(["run", str(cfg2)])
    assert (tmp_path / "out2" / "Reference_000_Final.mrc").exists()
    assert (tmp_path / "out2" / "Meta_Final.thu").exists()
