"""Multi-host execution: 2 processes x 4 virtual CPU devices running ONE
global (2, 4) mesh must reproduce the single-process 8-device run — the
property the reference gets from per-rank particle ranges + deterministic
RNG (src/Database.cpp:621-645, src/Parallel.cpp:17-67). Each worker loads
only its local shard's MRC slices (per-host data pipeline) and host 0
alone writes outputs."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from thunder_tpu.config import Para
from thunder_tpu.core.optimiser import Optimiser
from thunder_tpu.data import ParticleDataset
from thunder_tpu.io import write_mrc
from thunder_tpu.io.thu import make_table, write_thu
from thunder_tpu.parallel.mesh import make_mesh

from test_engine import _dataset, B, N

pytestmark = pytest.mark.slow


def _para():
    return Para(size=N, pixel_size=2.0, k=1, mask_radius=22.0, m_s=128,
                m_l_r=16, m_l_t=4, m_l_d=4, m_reco=4, trans_s=1.5,
                init_res=20.0, global_search_res=6.0, sym="C1",
                save_ref_each_iter=True, save_thu_each_iter=True,
                image_batch=2, seed=3)


def _write_dataset(workdir):
    vol, imgs, cp = _dataset()
    write_mrc(os.path.join(workdir, "stack.mrcs"), imgs, voxel_size=2.0)
    write_mrc(os.path.join(workdir, "init.mrc"), vol, voxel_size=2.0)
    table = make_table(
        B,
        particle_paths=[f"{i+1}@stack.mrcs" for i in range(B)],
        micrograph_paths=["none"] * B,
        voltage=cp["voltage"], defocus_u=cp["defocus_u"],
        defocus_v=cp["defocus_v"], defocus_theta=cp["defocus_theta"],
        cs=cp["cs"], amplitude_contrast=cp["amp_contrast"],
        phase_shift=cp["phase_shift"],
        group_id=np.ones(B, np.int32),
    )
    write_thu(os.path.join(workdir, "particles.thu"), table)
    return vol


def _run_cluster_and_compare(workdir, n_procs, rounds, port):
    """Single-process (8-device) reference run vs an n_procs-process
    cluster over the SAME dataset path, ``rounds`` full iterations each
    (2 rounds covers reconstruct-with-averaging, norm correction and the
    second-round state round-trip)."""
    para = _para()
    with open(os.path.join(workdir, "para.json"), "w") as f:
        json.dump(dataclasses_asdict(para), f)

    # ---- single-process reference run over the same dataset path ----
    ds = ParticleDataset(os.path.join(workdir, "particles.thu"),
                         particle_prefix=workdir, seed=para.seed)
    para_sp = _para()
    para_sp.output_directory = os.path.join(workdir, "out_sp")
    opt = Optimiser(para_sp, mesh=make_mesh(n_devices=8))
    opt.set_data_from_dataset(ds)
    from thunder_tpu.io import read_mrc

    opt.init_reference(read_mrc(os.path.join(workdir, "init.mrc")))
    opt.init_sigma()
    rec = None
    for _ in range(rounds):
        rec = opt.run_iteration()
        opt.save_outputs()

    # ---- n_procs-process run ----
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), workdir, port, str(n_procs),
         str(rounds)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(n_procs)]
    outs = [p.communicate(timeout=1800)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-4000:]}"

    # host 0 wrote the per-round outputs; other hosts wrote nothing (the
    # workers assert their private dirs stayed empty)
    out_mp = os.path.join(workdir, "out_mp")
    for r in range(1, rounds + 1):
        assert os.path.exists(
            os.path.join(out_mp, f"Meta_Round_{r:03d}.thu"))
        assert os.path.exists(
            os.path.join(out_mp, f"Reference_000_A_Round_{r:03d}.mrc"))
    res = np.load(os.path.join(workdir, "mp_result.npz"))

    # per-image results are keyed by global image index -> process-count
    # independent (float-accumulation noise only; tolerances widen a bit
    # after a second round's reductions)
    # round 1 is near-bitwise (per-image randomness is keyed by global
    # image index); a SECOND round compounds float-reordering differences
    # through sigma -> likelihood weights -> posteriors, so its bounds
    # are percent-level (the reference guarantees nothing at all across
    # rank counts — poses staying within 2e-3 already exceeds parity)
    tol = 2e-4 if rounds == 1 else 2e-3
    np.testing.assert_allclose(res["top_r"], opt.best_quat, atol=tol)
    np.testing.assert_allclose(res["top_t"], opt.best_trans, atol=tol)
    fsc_tol = 5e-3 if rounds == 1 else 3e-2
    np.testing.assert_allclose(res["fsc"][:, :5], opt.fsc[:, :5],
                               atol=fsc_tol)
    np.testing.assert_allclose(res["fsc"], opt.fsc, atol=0.12)
    np.testing.assert_allclose(res["sig"], np.asarray(opt.sig), rtol=2e-3)
    if rounds == 1:
        np.testing.assert_allclose(
            res["refs"], np.asarray(opt.refs), rtol=2e-3,
            atol=1e-3 * float(np.abs(np.asarray(opt.refs)).max()))
        assert int(res["res_shell"]) == rec["res_shell"]
    else:
        # a second round's resampling draws are DISCRETE: percent-level
        # round-1 drift can flip a tie and change a few images' inserted
        # poses, moving map spots by a few percent — compare maps
        # statistically (like the bf16-table contract in test_engine)
        a = np.asarray(res["refs"]).ravel()
        b = np.asarray(opt.refs).ravel()
        corr = float(np.corrcoef(a, b)[0, 1])
        assert corr > 0.995, corr
        assert abs(int(res["res_shell"]) - rec["res_shell"]) <= 1


def test_two_process_two_rounds_matches_single_process(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")
    workdir = str(tmp_path)
    _write_dataset(workdir)
    _run_cluster_and_compare(workdir, n_procs=2, rounds=2, port="12437")


def test_four_process_run_matches_single_process(tmp_path):
    """4 processes x 2 local devices — the deeper host split must agree
    too (per-host shard loading with 2 rows per host)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")
    workdir = str(tmp_path)
    _write_dataset(workdir)
    _run_cluster_and_compare(workdir, n_procs=4, rounds=1, port="12439")


def dataclasses_asdict(para):
    import dataclasses

    return dataclasses.asdict(para)


def test_two_process_subtraction_writers(tmp_path):
    """Per-rank signal subtraction (saveSubtract, src/Optimiser.cpp:8418):
    each process writes Subtract_Rank_{i}.mrcs for its own images; host 0
    writes one merged Meta_Subtract.thu whose paths point into the right
    rank file; reassembling via those paths reproduces the single-process
    subtracted stack."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")
    import re
    import subprocess
    import sys

    from thunder_tpu.io import read_mrc
    from thunder_tpu.io.thu import read_thu

    workdir = str(tmp_path)
    _write_dataset(workdir)
    para = _para()
    with open(os.path.join(workdir, "para.json"), "w") as f:
        json.dump(dataclasses_asdict(para), f)

    # single-process subtraction over the same dataset
    ds = ParticleDataset(os.path.join(workdir, "particles.thu"),
                         particle_prefix=workdir, seed=para.seed)
    para_sp = _para()
    para_sp.output_directory = os.path.join(workdir, "out_sp")
    from thunder_tpu.io import read_mrc as _rm

    opt = Optimiser(para_sp, mesh=make_mesh(n_devices=8))
    opt.set_data_from_dataset(ds)
    opt.init_reference(_rm(os.path.join(workdir, "init.mrc")))
    opt.init_sigma()
    opt.run_iteration()
    opt.para.subtract = True
    opt.para.region_centre = ""
    opt._subtract_pipeline()
    sp_stack = read_mrc(os.path.join(workdir, "out_sp",
                                     "Subtract_Rank_000000.mrcs"))
    sp_meta = read_thu(os.path.join(workdir, "out_sp", "Meta_Subtract.thu"))

    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), workdir, "12441", "2", "1",
         "subtract"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=1800)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-4000:]}"

    out_mp = os.path.join(workdir, "out_mp")
    stacks = {r: read_mrc(os.path.join(
        out_mp, f"Subtract_Rank_{r:06d}.mrcs")) for r in (0, 1)}
    meta = read_thu(os.path.join(out_mp, "Meta_Subtract.thu"))
    g = 1 + opt.sym.n_elements
    assert len(meta) == g * B == len(sp_meta)
    # every image present exactly once per symmetry element across ranks
    assert stacks[0].shape[0] + stacks[1].shape[0] == g * B
    # reassemble via the meta paths; rows are image-major like single-proc
    for row in range(0, g * B, 7):
        m = re.match(r"(\d+)@.*Subtract_Rank_(\d+)\.mrcs",
                     meta.particle_paths[row])
        sl, rk = int(m.group(1)) - 1, int(m.group(2))
        img_mp = stacks[rk][sl]
        m2 = re.match(r"(\d+)@", sp_meta.particle_paths[row])
        img_sp = sp_stack[int(m2.group(1)) - 1]
        c = np.corrcoef(img_mp.ravel(), img_sp.ravel())[0, 1]
        assert c > 0.99, (row, c)
