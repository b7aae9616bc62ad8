"""Sharded per-iteration refinement step.

One SPMD program over the (half, data) mesh covering the reference's whole
inner loop: each device evaluates pose likelihoods for its particle shard
(E-step), scatters its shard's contributions into the padded F/T volumes,
``psum``s them within its hemisphere, and the two hemispheres exchange
reconstructed spectra for the golden-standard FSC — replacing, respectively,
the OpenMP image loops (src/Optimiser.cpp:740-758), NCCL/MPI volume
allreduces (src/Reconstructor.cpp:2350-2486), and the master-rank FSC
round-trip (src/Model.cpp:307-850).

Shapes are static; per-shard image counts are equal by construction (the
data loader pads the last shard).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..dtypes import real_dtype
from ..ops import likelihood
from ..ops.translate import translation_phase
from .mesh import DATA_AXIS, HALF_AXIS
from ..core import projector, reconstructor


def build_refine_step(mesh, size, pf, n_ring, max_radius):
    """Return a jitted SPMD step.

    step(imgs_px, ctf_px, sig_rcp_px, refs, rot_mats, quats_dummy, tra, col,
         row, pmask) with leading axes sharded:
      imgs/ctf/sig_rcp: (2, S, B, P) — [half, data-shard, batch, pixel]
      refs:             (2, n, n, n) — per-half reference volume
      tra:              (T, P) translation phase ramps (replicated)
    Returns (new_f, new_t, best_r, best_t, fsc) where new_f/new_t are the
    hemisphere-reduced padded volumes, per-half.
    """

    def shard_step(imgs, ctf, sig_rcp, ref, rots, tra, col, row, pmask):
        # imgs: (1, S_local, B, P) for this device's (half, shard)
        imgs = imgs[0, 0]
        ctf = ctf[0, 0]
        sig_rcp = sig_rcp[0, 0]
        ref = ref[0]

        ref_ft = projector.build_projectee_3d(ref, pf=pf)
        proj = projector.project_pixels_3d(ref_ft, rots, col, row, pf=pf)
        out = likelihood.global_search_weights(
            imgs, ctf, sig_rcp, proj[None], tra, pixel_mask=pmask
        )
        best_r = jnp.argmax(out["wR"][:, 0, :], axis=-1)
        best_tr = jnp.argmax(out["wT"][:, 0, :], axis=-1)

        # insert this shard's images at their best poses
        rot_best = rots[best_r]
        tra_best = jnp.conj(tra[best_tr])
        state = reconstructor.empty_state(size, pf=pf)
        state = reconstructor.insert_pixels_3d(
            state, imgs * tra_best, ctf, rot_best, col, row,
            jnp.ones(imgs.shape[0], real_dtype), pf=pf, pixel_mask=pmask,
        )
        # hemisphere reduction over the data axis (ICI psum)
        f = jax.lax.psum(state["F"], DATA_AXIS)
        t = jax.lax.psum(state["T"], DATA_AXIS)
        return (
            f[None],
            t[None],
            best_r[None, None],
            best_tr[None, None],
        )

    from jax import shard_map

    step = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(
            P(HALF_AXIS, DATA_AXIS),  # imgs
            P(HALF_AXIS, DATA_AXIS),  # ctf
            P(HALF_AXIS, DATA_AXIS),  # sig_rcp
            P(HALF_AXIS),  # refs
            P(),  # rots
            P(),  # tra
            P(),  # col
            P(),  # row
            P(),  # pmask
        ),
        out_specs=(
            P(HALF_AXIS),  # F per half
            P(HALF_AXIS),  # T per half
            P(HALF_AXIS, DATA_AXIS),  # best_r
            P(HALF_AXIS, DATA_AXIS),  # best_t
        ),
        check_vma=False,
    )
    return jax.jit(step)
