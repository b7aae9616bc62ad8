"""Multi-process worker for test_multiprocess.py: joins a 2-process
jax.distributed cluster (4 virtual CPU devices each -> one global 8-device
(2, 4) mesh), loads ONLY its local shard's stack slices, runs one full
refinement iteration, and lets host 0 write the outputs.

Usage: python mp_worker.py <process_id> <workdir> <port>
"""

import json
import os
import sys

pid = int(sys.argv[1])
workdir = sys.argv[2]
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)

import numpy as np

from thunder_tpu.config import Para
from thunder_tpu.core.optimiser import Optimiser
from thunder_tpu.data import ParticleDataset
from thunder_tpu.io import read_mrc
from thunder_tpu.parallel.mesh import make_mesh

assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

with open(os.path.join(workdir, "para.json")) as f:
    para = Para(**json.load(f))
para.output_directory = os.path.join(workdir, "out_mp")

ds = ParticleDataset(os.path.join(workdir, "particles.thu"),
                     particle_prefix=workdir, seed=para.seed)
opt = Optimiser(para, mesh=make_mesh())
opt.set_data_from_dataset(ds)
opt.init_reference(read_mrc(os.path.join(workdir, "init.mrc")))
opt.init_sigma()
rec = opt.run_iteration()
opt.save_outputs()

# gather the comparison payload on every host; host 0 dumps it
top_r = opt.best_quat
top_t = opt.best_trans
if pid == 0:
    np.savez(os.path.join(workdir, "mp_result.npz"),
             top_r=top_r, top_t=top_t, fsc=opt.fsc,
             sig=np.asarray(opt.sig), refs=np.asarray(opt.refs),
             res_shell=rec["res_shell"])
print(f"worker {pid} done", flush=True)
