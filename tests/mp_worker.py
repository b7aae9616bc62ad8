"""Multi-process worker for test_multiprocess.py: joins an N-process
jax.distributed cluster (8/N virtual CPU devices each -> one global
8-device (2, 4) mesh), loads ONLY its local shard's stack slices, runs
``rounds`` full refinement iterations (saving outputs each round, like the
reference's per-round Meta/Reference dumps), and lets host 0 write them.

Non-zero hosts point at their OWN output directory and assert it stays
empty — proving save_outputs really is host-0-only (no write collisions;
the reference serializes through its master rank, src/Optimiser.cpp:8250).

Usage: python mp_worker.py <process_id> <workdir> <port> <n_procs> <rounds>
"""

import json
import os
import sys

pid = int(sys.argv[1])
workdir = sys.argv[2]
port = sys.argv[3]
n_procs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 1
subtract = len(sys.argv) > 6 and sys.argv[6] == "subtract"

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={8 // n_procs}")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{port}", num_processes=n_procs,
                           process_id=pid)

import numpy as np

from thunder_tpu.config import Para
from thunder_tpu.core.optimiser import Optimiser
from thunder_tpu.data import ParticleDataset
from thunder_tpu.io import read_mrc
from thunder_tpu.parallel.mesh import make_mesh

assert len(jax.devices()) == 8
assert len(jax.local_devices()) == 8 // n_procs

with open(os.path.join(workdir, "para.json")) as f:
    para = Para(**json.load(f))
para.output_directory = os.path.join(
    workdir, "out_mp" if pid == 0 else f"out_mp_p{pid}")

ds = ParticleDataset(os.path.join(workdir, "particles.thu"),
                     particle_prefix=workdir, seed=para.seed)
opt = Optimiser(para, mesh=make_mesh())
opt.set_data_from_dataset(ds)
opt.init_reference(read_mrc(os.path.join(workdir, "init.mrc")))
opt.init_sigma()
rec = None
for _ in range(rounds):
    rec = opt.run_iteration()
    opt.save_outputs()

if pid != 0:
    # host-0-only writes: this host's private output dir must stay empty
    leaked = (os.listdir(para.output_directory)
              if os.path.isdir(para.output_directory) else [])
    assert not leaked, f"non-main host {pid} wrote outputs: {leaked}"

if subtract:
    # per-rank subtraction writer (saveSubtract, src/Optimiser.cpp:8418):
    # EVERY process writes its own Subtract_Rank_{i}.mrcs into the SHARED
    # output dir; only host 0 writes the merged Meta_Subtract.thu
    opt.para.output_directory = os.path.join(workdir, "out_mp")
    opt.para.subtract = True
    opt.para.region_centre = ""
    opt._subtract_pipeline()

# gather the comparison payload on every host; host 0 dumps it
top_r = opt.best_quat
top_t = opt.best_trans
if pid == 0:
    np.savez(os.path.join(workdir, "mp_result.npz"),
             top_r=top_r, top_t=top_t, fsc=opt.fsc,
             sig=np.asarray(opt.sig), refs=np.asarray(opt.refs),
             res_shell=rec["res_shell"])
print(f"worker {pid} done", flush=True)
