"""Device mesh for golden-standard refinement.

The reference's entire 4-level parallel stack — MPI master/hemisphere ranks
(src/Parallel.cpp:17-67), per-rank OpenMP threads, AVX lanes and per-process
NCCL GPU groups (gpu/src/cuthunder.cu:3312-3351) — collapses into ONE
``jax.sharding.Mesh`` with axes:

- ``half``: size 2 — hemisphere A/B. Each half owns an independent
  reconstruction; they only talk during FSC comparison (a tiny all_gather
  once per iteration, replacing Model::compareTwoHemispheres' master-rank
  MPI sends, src/Model.cpp:307-850).
- ``data``: particle shards within a half. Volume F/T reduction is
  ``psum("data")`` over ICI, replacing MPI_Allreduce_Large's 2 GB chunking
  (src/Parallel.cpp:158-347) and NCCL allreduce (cuthunder.cu:3929-4033).

There is no master rank: every process runs the same SPMD program; host 0
writes files.
"""

import numpy as np

import jax
from jax.sharding import Mesh

HALF_AXIS = "half"
DATA_AXIS = "data"


def make_mesh(n_devices=None, n_halves=2, devices=None):
    """Mesh of shape (half, data). With a single device, both axes are 1
    (golden-standard halves then timeshare the device)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % n_halves != 0:
        n_halves = 1
    arr = np.asarray(devices).reshape(n_halves, n // n_halves)
    return Mesh(arr, (HALF_AXIS, DATA_AXIS))
