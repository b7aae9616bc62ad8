"""Multi-process (multi-host) execution support.

The reference is an MPI program: per-rank particle ranges
(src/Database.cpp:621-645), per-rank MRC reads
(src/Optimiser.cpp:4608-4660), hemisphere communicators
(src/Parallel.cpp:17-67) and a master rank that alone touches the
filesystem. The TPU-native equivalent: ``jax.distributed`` connects the
processes, ONE global ``Mesh(half, data)`` spans every chip, all
collectives stay ``psum``/resharding on the global arrays, and the "master
rank" degenerates to "process 0 writes files" — every process runs the
same SPMD host program.

Helpers here cover the three things multi-process JAX actually changes:

- :func:`maybe_initialize` — ``jax.distributed.initialize`` from explicit
  args or the standard environment variables,
- :func:`host_np` — bring a (possibly non-addressable) global array to
  every host as numpy (``process_allgather``); the single-process fast
  path is a plain ``np.asarray``,
- :func:`local_plane_rows` — which (half, slot) entries of the half-plane
  layout live on THIS process's devices (per-host data loading).
"""

import numpy as np

import jax


def maybe_initialize(coordinator=None, num_processes=None, process_id=None,
                     local_device_ids=None):
    """Join the distributed runtime when configured; no-op otherwise.

    Explicit args win; else the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or a
    supported cluster environment (TPU pod metadata) are used. Returns
    True when the runtime was initialised."""
    import os

    if jax.process_count() > 1:
        return True  # already initialised
    env = os.environ
    if coordinator is None:
        coordinator = env.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def is_main():
    """True on the process that writes files (the reference's master
    rank's only surviving duty)."""
    return jax.process_index() == 0


def host_np(x):
    """Global array -> full numpy copy on EVERY host.

    Single process: plain np.asarray. Multi-process: process_allgather —
    a COLLECTIVE, so every process must call it (like the reference's
    gathers to master before saveDatabase, src/Optimiser.cpp:8250)."""
    if not hasattr(x, "sharding") or x.is_fully_addressable:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def local_plane_rows(sharding, shape):
    """For a half-plane array of ``shape`` (2, S, ...) under ``sharding``,
    return the set of (half, slot) index pairs stored on this process's
    devices — the per-host particle range (Database::split parity,
    src/Database.cpp:621-645)."""
    rows = set()
    for dev, idx in sharding.addressable_devices_indices_map(shape).items():
        h_sl, s_sl = idx[0], idx[1]
        for h in range(*h_sl.indices(shape[0])):
            for s in range(*s_sl.indices(shape[1])):
                rows.add((h, s))
    return rows
