"""Sharded SPMD execution engine over the (half, data) mesh.

This is the integration layer the reference implements with its MPI
topology: hemisphere A/B ranks + per-rank particle ranges
(src/Parallel.cpp:17-67, src/Database.cpp:621-645), OpenMP image loops
(src/Optimiser.cpp:740-758, :1138-1660), NCCL/MPI volume allreduces
(src/Reconstructor.cpp:2350-2486, gpu/src/cuthunder.cu:3929-4033) and
slave-communicator stat allreduces (src/Optimiser.cpp:6397). Here each
becomes one ``shard_map``-ed program over ``Mesh((half, data))``:

- images (and the whole particle-filter state) live in HALF-PLANE layout
  ``(2, S, ...)`` sharded ``P(half, data)``: plane 0 = hemisphere A,
  plane 1 = hemisphere B, S slots per hemisphere (padded to a multiple of
  the data-axis size; invalid slots carry weight 0),
- per-hemisphere reference brick tables are sharded ``P(half)``: each
  device holds only its hemisphere's classes (both, on a 1-half mesh),
- the E-step (global scan + particle-filter local search) needs NO
  collectives — it runs to completion device-locally, including the
  adaptive phase loop (a ``lax.while_loop`` per image chunk; divergent
  trip counts across devices are fine because nothing inside
  communicates),
- the gridding insert reduces its class-fused brick accumulators with
  ``psum("data")`` — the hemisphere volume allreduce — and returns
  per-half accumulators,
- M-step statistics (sigma / intensity scale / norm) reduce with
  ``psum(("half", "data"))`` — the reference's slave-communicator
  allreduce.

Randomness is driven by PER-IMAGE keys carried with the images (derived
from the global image index, not the slot position), so results do not
depend on the mesh shape — the 1-device and 8-device programs produce
identical posteriors (tested in tests/test_engine.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..dtypes import real_dtype
from ..geom import quat
from ..ops import brick, likelihood
from ..ops import ctf as ctf_ops
from ..ops.translate import translation_phase
from ..core import particle, projector
from .mesh import DATA_AXIS, HALF_AXIS

# ctf param packing order for the (2, S, 7) array
CTF_FIELDS = ("voltage", "defocus_u", "defocus_v", "defocus_theta", "cs",
              "amp_contrast", "phase_shift")


def plane_sharding(mesh):
    """Half-plane layout (2, S, ...): plane axis over ``half``, slots over
    ``data``."""
    return NamedSharding(mesh, P(HALF_AXIS, DATA_AXIS))


def half_sharding(mesh):
    return NamedSharding(mesh, P(HALF_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def pack_ctf(cp):
    """ctf param dict of (...,) arrays -> (..., 7) packed array."""
    return jnp.stack([jnp.asarray(cp[f], real_dtype) for f in CTF_FIELDS],
                     axis=-1)


def plane_keys(key, plane_index):
    """(2, S) global image indices -> (2, S, 2) uint32 per-image keys.
    Layout-independent: each key is fold_in(key, global index), so the same
    image gets the same randomness on any mesh shape."""
    idx = jnp.asarray(plane_index, jnp.uint32)
    ks = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx.reshape(-1))
    return ks.reshape(idx.shape + (2,))


def _chunked(x, chunk, zero_pad=False):
    """(S, ...) -> (C, chunk, ...). Pad rows repeat row 0 by default (their
    RESULTS are discarded by _unchunked, and a valid copy keeps every lane
    numerically safe inside while_loops). Weight/validity inputs feeding
    ACCUMULATING scans must pass ``zero_pad=True`` so pad rows contribute
    nothing to psum'd statistics or brick accumulators."""
    s = x.shape[0]
    c = -(-s // chunk)
    pad = c * chunk - s
    if pad:
        fill = (jnp.zeros((pad,) + x.shape[1:], x.dtype) if zero_pad
                else jnp.broadcast_to(x[:1], (pad,) + x.shape[1:]))
        x = jnp.concatenate([x, fill], 0)
    return x.reshape((c, chunk) + x.shape[1:])


def _unchunked(x, s):
    return x.reshape((-1,) + x.shape[2:])[:s]


def _rot_mats(r_sup, mode):
    """Support rotations -> matrices. 2D convention: (w, x) slots hold
    (cos phi, sin phi) of the FULL in-plane angle."""
    if mode == "2d":
        c, s = r_sup[..., 0], r_sup[..., 1]
        return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    return quat.rotate3d(r_sup)


def _project_class_stack(bricks_h, rots, col, row, pf, mode):
    """All-class projections (K, R, P) from one hemisphere's brick tables."""
    if mode == "2d":
        return jax.vmap(
            lambda tab: projector.project_brick_2d(tab, rots, col, row, pf=pf)
        )(bricks_h)
    return jax.vmap(
        lambda tab: projector.project_brick_3d(tab, rots, col, row, pf=pf)
    )(bricks_h)


def _split_bricks(bricks):
    """Brick tables arrive either as one (2, K, ...) stack or as a
    radius-tiered pair (big, inner) (optimiser._built_tabs: inner is a
    central crop of the big half-space table, used for pixels whose
    3D samples stay inside it — the crop sits below the v5e 4M-row
    gather cliff, the big table above it)."""
    if isinstance(bricks, tuple):
        return bricks
    return bricks, None


def _brick_spec(bricks):
    """shard_map in_spec matching the (possibly tiered) brick pytree."""
    return jax.tree.map(lambda _: P(HALF_AXIS), bricks)


def _tier_gather(flat_big, flat_in, coords, cls, mc, mc_in, mode, half,
                 p_in):
    """Radius-tiered fused class gather: the first ``p_in`` pixels (the
    ring is sorted by |k|, ops.pixels) gather from the inner table crop,
    the rest from the big table. Exact: inner-tier samples are valid in
    both tables and the crop's rows equal the big table's."""
    if flat_in is None or p_in <= 0:
        return _fused_class_gather(flat_big, coords, cls, mc, mode,
                                   half=half)
    if p_in >= coords.shape[-2]:
        return _fused_class_gather(flat_in, coords, cls, mc_in, mode,
                                   half=True)
    a = _fused_class_gather(flat_in, coords[..., :p_in, :], cls, mc_in,
                            mode, half=True)
    b = _fused_class_gather(flat_big, coords[..., p_in:, :], cls, mc,
                            mode, half=half)
    return jnp.concatenate([a, b], axis=-1)


def _brick_geom(bricks, mode):
    """(mc, is_half) of a (2, K, ...) brick-table stack. 3D Hermitian
    half-space tables (brick.pack_vol3_half) have a shorter z axis."""
    mc = bricks.shape[-2]
    if mode == "2d":
        return mc, False
    return mc, bricks.shape[-4] != mc


def _fused_class_gather(flat, coords, cls, mc, mode, half=False):
    """Gather each image's slice from ITS class's brick table: one fused
    row-fetch with the class folded into the flat index (no K-fold
    projection + select; src/Optimiser.cpp:925-955 evaluates only the drawn
    class in phase B). flat: (K * n_vox, 2 * corners) f32 table or
    (K * n_vox, corners) packed-bf16-pair table (brick.pack_vol3);
    ``half=True`` for 3D Hermitian half-space tables (pack_vol3_half,
    conjugate-mirror fetch for z < 0 samples)."""
    sgn = None
    if mode == "2d":
        idx, w_c, valid = brick._corners2(coords, mc)
        n_vox, n_corner = mc**2, 4
    elif half:
        idx, w_c, valid, sgn = brick._corners3_half(coords, mc)
        n_vox, n_corner = brick.half_rows(mc) * mc * mc, 8
    else:
        idx, w_c, valid = brick._corners3(coords, mc)
        n_vox, n_corner = mc**3, 8
    n_chan = flat.shape[-1]
    idx = jnp.where(valid, idx, 0) + (cls * n_vox).reshape(
        (-1,) + (1,) * (idx.ndim - 1))
    rows = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
        idx.shape + (n_chan,))
    if n_chan == n_corner:  # packed bf16 pairs, one lane per corner
        rr, ri = brick.unpack_pair_rows(rows)
    else:
        rows = rows.astype(jnp.float32)
        rr, ri = rows[..., :n_corner], rows[..., n_corner:]
    re = jnp.sum(rr * w_c, -1)
    im = jnp.sum(ri * w_c, -1)
    if sgn is not None:
        im = im * sgn
    return jnp.where(valid, jax.lax.complex(re, im), 0.0)


def _fused_class_insert(tab, coords, cls, fv, tv, mc, mode,
                        kernel="trilinear", blob_a=1.9, alpha=15.0):
    """Scatter pose-weighted pixels into the class-fused brick accumulator
    ((K * mc^d + 1, width) rows; last row is the drop slot). cls: (B,).
    kernel: "trilinear" (one row-add/sample) or "mkb" (3D only; 8
    row-adds/sample over the blob support, src/Reconstructor.cpp:452-556)."""
    if mode == "2d":
        rows = [brick._corners2(coords, mc)]
        n_vox = mc**2
    elif kernel == "mkb":
        rows = brick.mkb_rows3(coords, mc, a=blob_a, alpha=alpha)
        n_vox = mc**3
    else:
        rows = [brick._corners3(coords, mc)]
        n_vox = mc**3
    k_cls = (tab.shape[0] - 1) // n_vox
    for idx, w_c, valid in rows:
        idx = idx + (cls * n_vox).reshape((-1,) + (1,) * (idx.ndim - 1))
        idx = jnp.where(valid, idx, k_cls * n_vox)
        contrib = jnp.concatenate(
            [fv.real[..., None] * w_c, fv.imag[..., None] * w_c,
             tv[..., None] * w_c], -1)
        width = contrib.shape[-1]
        tab = tab.at[idx.reshape(-1)].add(contrib.reshape(-1, width))
    return tab


# ------------------------------------------------------------- global scan

@partial(jax.jit, static_argnames=("mesh", "mode", "pf", "m_l_r", "m_l_t",
                                   "m_l_d", "chunk", "fused", "p_in"))
def scan_init(mesh, bricks, rots, quats, tra, trans, col, row, pmask,
              dat, ctf, sig_rcp, keys, *, mode, pf, m_l_r, m_l_t, m_l_d,
              chunk, fused="off", p_in=0):
    """Phase A: dense pose scan for every image against its hemisphere's
    class references, fused with the particle-filter seeding
    (src/Optimiser.cpp:633-1136). No collectives — per-image work only.

    bricks: (2, K, ...) per-half class brick tables
    rots: (R, d, d) scan rotations; quats (R, 4); tra (T, P); trans (T, 2)
    dat/ctf/sig_rcp: (2, S, P) half-plane image pixels
    keys: (2, S, 2) per-image base keys
    Returns (par_state pytree (2, S, ...), wC (2, S, K)).
    """
    lh = 2 // mesh.shape[HALF_AXIS]

    def local(bricks, rots, quats, tra, trans, col, row, pmask,
              dat, ctf, sig_rcp, keys):
        big, inner = _split_bricks(bricks)
        outs, wcs = [], []
        for h in range(lh):
            if inner is None or p_in <= 0:
                proj = _project_class_stack(big[h], rots, col, row, pf,
                                            mode)
            elif p_in >= col.shape[0]:
                proj = _project_class_stack(inner[h], rots, col, row, pf,
                                            mode)
            else:
                pa = _project_class_stack(inner[h], rots, col[:p_in],
                                          row[:p_in], pf, mode)
                pb = _project_class_stack(big[h], rots, col[p_in:],
                                          row[p_in:], pf, mode)
                proj = jnp.concatenate([pa, pb], axis=-1)
            s_loc = dat.shape[1]

            def chunk_fn(args, proj=proj):
                d, c, s, ky = args
                if fused == "off":
                    out = likelihood.global_search_weights(
                        d, c, s, proj, tra, pixel_mask=pmask)
                else:
                    out = likelihood.global_search_weights_fused(
                        d, c, s, proj, tra, pixel_mask=pmask,
                        interpret=(fused == "interpret"))
                ky3 = jax.vmap(lambda k: jax.random.split(k, 3))(ky)
                st = particle.init_from_scan(
                    ky3, out["wC"], out["wR"], out["wT"], quats, trans,
                    m_l_r, m_l_t, m_l_d, mode=mode)
                return st, out["wC"]

            st, wc = jax.lax.map(chunk_fn, tuple(
                _chunked(x[h], chunk) for x in (dat, ctf, sig_rcp, keys)))
            outs.append(jax.tree.map(lambda x: _unchunked(x, s_loc), st))
            wcs.append(_unchunked(wc, s_loc))
        st = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
        return st, jnp.stack(wcs)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(_brick_spec(bricks),) + (P(),) * 7
        + (P(HALF_AXIS, DATA_AXIS),) * 4,
        out_specs=(P(HALF_AXIS, DATA_AXIS), P(HALF_AXIS, DATA_AXIS)),
        check_vma=False,
    )(bricks, rots, quats, tra, trans, col, row, pmask, dat, ctf, sig_rcp,
      keys)


# ------------------------------------------------------------ local search

@partial(jax.jit, static_argnames=("mesh", "mode", "pf", "n", "pixel_size",
                                   "ctf_search", "min_phase", "chunk",
                                   "n_phases", "p_in"))
def local_search(mesh, bricks, col, row, pmask, dat, ctf, sig_rcp, state,
                 keys, cp, sym_quats, factor_l, factor_s, factor_d, phase0,
                 *, mode, pf, n, pixel_size, ctf_search, min_phase, chunk,
                 n_phases, p_in=0):
    """Phase B: a BLOCK of ``n_phases`` particle-filter refinement phases,
    device-resident (src/Optimiser.cpp:1138-1660). Each image chunk runs a
    masked ``lax.while_loop`` with the reference's termination rule.

    The host drives the outer phase loop in blocks
    (Optimiser.local_search): one unbounded dispatch covering up to
    MAX_N_PHASE_PER_ITER (=100) phases could run for many minutes on the
    chip, which is both un-interruptible and beyond remote-runtime
    execution watchdogs (the r3 bench fault); a block keeps every dispatch
    bounded while the state stays on device between blocks. Chunks whose
    images are all done exit the while_loop immediately, so finished work
    costs nothing in later blocks.

    state: particle pytree (2, S, ...) carrying the loop registers
    ``_done`` (2, S) bool, ``_noDec``/``_nph`` (2, S) int32 across blocks;
    keys: (2, S, 2) per-image base keys; cp: (2, S, 7) packed CTF params
    (pack_ctf); sym_quats: (G, 4) without identity; phase0: scalar int32,
    first phase index of this block. Returns the updated state.
    """
    lh = 2 // mesh.shape[HALF_AXIS]
    max_phase = particle.MAX_N_PHASE_PER_ITER

    def local(bricks, col, row, pmask, dat, ctf, sig_rcp, state, keys,
              cp, sym_quats, factor_l, factor_s, factor_d, phase0):
        # everything phase_fn touches is a shard-local value from this scope
        def phase_fn(phase, st, d_px, c_px, s_px, cpv, active, keys_c,
                     flat_tab, flat_in, mc, mc_in, half_t):
            """One phase: perturb -> fused-class project -> factored
            likelihood -> posterior update; frozen images pass through."""
            kph = jax.vmap(jax.random.fold_in)(keys_c, jnp.full(
                (keys_c.shape[0],), phase, jnp.uint32))
            subs = jax.vmap(lambda k: jax.random.split(k, 7))(kph)  # (B,7,2)
            factor = jnp.where(phase == 0, factor_l, factor_s)

            if mode == "2d":
                r_new = particle.perturb_r_2d(subs[:, 0], st["r"], st["k1"],
                                              factor)
            else:
                r_new = particle.perturb_r(subs[:, 0], st["r"], st["k1"],
                                           st["k2"], st["k3"], factor,
                                           sym_quats=sym_quats)
            t_new = particle.perturb_t(subs[:, 1], st["t"], st["s0"],
                                       st["s1"], factor)
            st = {
                **st,
                "r": jnp.where(active[:, None, None], r_new, st["r"]),
                "t": jnp.where(active[:, None, None], t_new, st["t"]),
            }
            if ctf_search:
                # defocus perturbed from phase 1 on (the phase-0 support is
                # the loaded/previous one, src/Optimiser.cpp:1191-1209)
                d_new = particle.perturb_d(subs[:, 2], st["d"], st["sD"],
                                           factor_d)
                d_new = jnp.where(phase > 0, d_new, st["d"])
                st["d"] = jnp.where(active[:, None], d_new, st["d"])

            rots = _rot_mats(st["r"], mode)
            if mode == "2d":
                coords = projector.slice_coords_2d(rots, col, row, pf=pf)
            else:
                coords = projector.slice_coords_3d(rots, col, row, pf=pf)
            proj = _tier_gather(flat_tab, flat_in, coords, st["c"], mc,
                                mc_in, mode, half_t, p_in)
            tra = translation_phase(col, row, st["t"][..., 0],
                                    st["t"][..., 1], n)
            ctf_d = None
            if ctf_search:
                ctf_d = ctf_ops.ctf_pixels(
                    col, row, n, pixel_size,
                    cpv[:, 0:1], cpv[:, 1:2], cpv[:, 2:3], cpv[:, 3:4],
                    cpv[:, 4:5], cpv[:, 5:6], cpv[:, 6:7],
                    defocus_factor=st["d"],
                )
            u_r, u_t, u_d = likelihood.local_search_weights(
                d_px, c_px, s_px, proj, tra, st["wR"], st["wT"], st["wD"],
                ctf_d=ctf_d, pixel_mask=pmask,
            )
            if ctf_search:
                # defocus peak factor is set at phase 0 (setPeakFactor,
                # src/Optimiser.cpp:1430)
                pf_d = particle.cal_peak_factor(
                    u_d, particle.peak_idx_d(u_d.shape[-1]))
                st = {**st, "pfD": jnp.where(phase == 0, pf_d, st["pfD"])}
            new_st = particle.update_from_likelihood(
                st, subs[:, 3:7], u_r, u_t, u_d, with_d=ctf_search,
                sym_quats=sym_quats, mode=mode,
            )
            prev_vari = {k: st[k]
                         for k in ("k1", "k2", "k3", "s0", "s1", "sD")}
            out = {
                k: jnp.where(active.reshape((-1,) + (1,) * (v.ndim - 1)), v,
                             st[k])
                for k, v in new_st.items()
            }
            shrank = particle.vari_shrank(out, prev_vari, mode=mode)
            return out, shrank

        big, inner = _split_bricks(bricks)
        outs = []
        for h in range(lh):
            mc, half_t = _brick_geom(big, mode)
            n_chan = big.shape[-1]
            flat = big[h].reshape((-1, n_chan))
            flat_in, mc_in = None, 0
            if inner is not None:
                mc_in = inner.shape[-2]
                flat_in = inner[h].reshape((-1, n_chan))
            s_loc = dat.shape[1]
            st_h = jax.tree.map(lambda x: x[h], state)

            def chunk_fn(args, flat_tab=flat, flat_in_=flat_in, mc_=mc,
                         mc_in_=mc_in, half_=half_t):
                st_all, d, c, s, ky, cpv = args
                st0 = {k: v for k, v in st_all.items()
                       if k not in ("_done", "_noDec", "_nph")}
                phase_end = jnp.minimum(phase0 + n_phases, max_phase)

                def cond(carry):
                    phase, _, _, done, _ = carry
                    return (phase < phase_end) & ~jnp.all(done)

                def body(carry):
                    phase, st, no_dec, done, nph = carry
                    st2, shrank = phase_fn(phase, st, d, c, s, cpv, ~done,
                                           ky, flat_tab, flat_in_, mc_,
                                           mc_in_, half_)
                    chk = phase >= min_phase
                    no_dec = jnp.where(
                        chk & ~done, jnp.where(shrank, 0, no_dec + 1), no_dec)
                    new_done = done | (chk & (
                        no_dec >= particle.N_PHASE_WITH_NO_VARI_DECREASE))
                    # per-image phase count at termination (observability:
                    # the reference logs nPhase heartbeats,
                    # src/Optimiser.cpp:1618-1627)
                    nph = jnp.where(new_done & ~done, phase + 1, nph)
                    return phase + 1, st2, no_dec, new_done, nph

                _, st_f, no_dec, done, nph = jax.lax.while_loop(
                    cond, body,
                    (phase0, st0, st_all["_noDec"], st_all["_done"],
                     st_all["_nph"]),
                )
                return {**st_f, "_done": done, "_noDec": no_dec,
                        "_nph": nph}

            st = jax.lax.map(chunk_fn, (
                jax.tree.map(lambda x: _chunked(x, chunk), st_h),
                _chunked(dat[h], chunk), _chunked(ctf[h], chunk),
                _chunked(sig_rcp[h], chunk), _chunked(keys[h], chunk),
                _chunked(cp[h], chunk),
            ))
            outs.append(jax.tree.map(lambda x: _unchunked(x, s_loc), st))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(_brick_spec(bricks),) + (P(),) * 3
        + (P(HALF_AXIS, DATA_AXIS),) * 6 + (P(),) * 5,
        out_specs=P(HALF_AXIS, DATA_AXIS),
        check_vma=False,
    )(bricks, col, row, pmask, dat, ctf, sig_rcp, state, keys, cp,
      sym_quats, factor_l, factor_s, factor_d, phase0)


@jax.jit
def permute_slots(order, tree):
    """Reorder the slot axis (axis 1 of every (2, S, ...) leaf) by
    ``order`` (2, S). Used by the host phase-block loop to pack still-
    active images into the leading chunks: a chunk's while_loop cost is
    set by its slowest image, so once most images are done the stragglers
    would otherwise keep whole chunks gathering. Per-image results are
    slot-independent (all randomness is keyed by values carried with the
    slot), so repacking is exact."""
    def tk(x):
        o = order.reshape(order.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, o.astype(jnp.int32), axis=1)

    return jax.tree.map(tk, tree)


# --------------------------------------------------------- gridding insert

@partial(jax.jit, static_argnames=("mesh", "mode", "pf", "n", "k_classes",
                                   "mc", "n_draw", "chunk", "insert_kernel",
                                   "blob_a", "alpha", "apply_sym",
                                   "insert_impl", "exact_ops"))
def insert_fold_reduce(mesh, col, row, pmask, dat_ori, ctf, state, keys,
                       w_img, tra_off, sym_rots, *, mode, pf, n, k_classes,
                       mc, n_draw, chunk, insert_kernel="trilinear",
                       blob_a=1.9, alpha=15.0, apply_sym=True,
                       insert_impl="scatter", exact_ops=()):
    """M-step gridding insert: draw ``n_draw`` poses per image from its
    particle filter (support points post-resample are uniform-weighted, so
    a uniform index draw IS a posterior draw; Optimiser::reconstructRef
    draws mReco support points, src/Optimiser.cpp:6711+), scatter each into
    its class's brick accumulator, and ``psum`` the accumulators over the
    data axis — the hemisphere volume allreduce
    (src/Reconstructor.cpp:2350-2486, gpu/src/cuthunder.cu:3929-4033).

    dat_ori: (2, S, P) UNMASKED image pixels — the reference inserts
    _imgOri translated by -(tran - offset) (allocPreCal(false,...) at
    src/Optimiser.cpp:6725, translate at :7161). ctf: (2, S, P);
    state: particle pytree; keys (2, S, 2); w_img: (2, S) insertion weight
    (score / n_draw, 0 for invalid slots); tra_off: (2, S, 2) accumulated
    re-centring offsets.

    The brick accumulator is FOLDED to voxels (+ deferred Hermitian mirror
    + symmetrization, both linear, so folding per device-partial before the
    psum is exact) INSIDE this program, per half, so only ONE
    (K mc^d + 1, width) table is ever live and only the 3-channel folded
    (F, T) crosses the collective — the 24-wide table psum + a host-side
    restack OOM'd the 16 GB chip at the Nyquist band (mc=317).
    sym_rots: (G, 3, 3) rotation matrices, may be empty; k_classes must
    be 1 (the optimiser stages classes sequentially).

    Returns (f (2, mc^d..) complex64, t (2, mc^d..) f32, offsets (2, K, 4))
    where offsets[..., :3] accumulate dir = -rot @ (tran - offset, 0) per
    draw and [..., 3] counts draws (Reconstructor::insertDir + allReduceO,
    src/Optimiser.cpp:7227-7233, src/Reconstructor.cpp:2455-2520).

    insert_impl: "scatter" = one XLA width-24 row scatter per sample
    (~121 ns/row on big accumulators); "sorted" = the Pallas sort-and-bin
    MXU path (ops.pallas_insert, ~17 ns/sample measured at the bench
    shape), 3D trilinear only — other modes fall back to scatter;
    "sorted_interpret" = same in Pallas interpret mode (CPU tests).

    k_classes > 1 uses the CLASS-FUSED accumulator ((K mc^d + 1) rows,
    each sample routed by its image's class like the reference's batched
    InsertI2D, gpu/src/cuthunder.cu:3265): ONE insert pass for a whole
    classification round instead of K staged passes. Outputs then carry a
    class axis: f (2, K, mc^d..), t (2, K, mc^d..). The caller is
    responsible for the K-fold accumulator fitting memory (the optimiser
    falls back to per-class staging near the Nyquist band)."""
    from ..core import reconstructor
    from ..ops import brick as brick_ops
    from ..ops import pallas_insert

    lh = 2 // mesh.shape[HALF_AXIS]
    n_vox = mc**2 if mode == "2d" else mc**3
    width = 12 if mode == "2d" else 24
    fold = brick_ops.fold_insert2 if mode == "2d" else brick_ops.fold_insert3
    use_sorted = (insert_impl in ("sorted", "sorted_interpret")
                  and mode == "3d" and insert_kernel == "trilinear")
    interp = insert_impl == "sorted_interpret"
    # draw-block size: bound the per-call sample array (8, B*D_c*P) f32
    # (sort + kernel work per call; bigger calls amortize the window-chunk
    # overlap — see pallas_insert)
    p_pix = col.shape[0]
    d_max = max(1, min(n_draw, 32_000_000 // max(1, chunk * p_pix)))
    nblk = -(-n_draw // d_max)
    d_c = -(-n_draw // nblk)  # even-ish split
    n_draw_pad = nblk * d_c

    def local(col_, row_, pmask_, dat, ctf, state, keys, w_img, tra_off,
              sym_rots_):
        f_hs, t_hs, offs = [], [], []
        for h in range(lh):
            st_h = jax.tree.map(lambda x: x[h], state)

            def chunk_step_sorted(carry, args):
                """Sorted-insert variant: same draws/keys as chunk_step,
                but all samples of a draw BLOCK go through ONE
                sort-and-bin Pallas update (ops.pallas_insert) instead of
                per-draw row scatters."""
                tab_lane, off = carry
                d, c, ky, w, o_img, r_sup, t_sup, cls = args
                k1 = jax.vmap(lambda k: jax.random.fold_in(k, 101))(ky)
                k2 = jax.vmap(lambda k: jax.random.fold_in(k, 102))(ky)
                ri = jax.vmap(
                    lambda k: jax.random.randint(k, (n_draw,), 0,
                                                 r_sup.shape[1]))(k1)
                ti = jax.vmap(
                    lambda k: jax.random.randint(k, (n_draw,), 0,
                                                 t_sup.shape[1]))(k2)
                q_d = jnp.take_along_axis(r_sup, ri[..., None], axis=1)
                t_d = jnp.take_along_axis(t_sup, ti[..., None], axis=1)
                t_rel = t_d - o_img[:, None, :]  # (B, n_draw, 2)
                # re-centring accumulator, all draws at once
                rots_all = _rot_mats(q_d, mode)  # (B, n_draw, 3, 3)
                t3 = jnp.concatenate(
                    [t_rel, jnp.zeros_like(t_rel[..., :1])], -1)
                dirv = -jnp.einsum("bnij,bnj->bni", rots_all, t3)
                cnt = jnp.broadcast_to((w > 0)[:, None],
                                       dirv.shape[:2]).astype(real_dtype)
                o_add = jnp.concatenate(
                    [dirv * cnt[..., None], cnt[..., None]], -1)
                off = off.at[cls].add(jnp.sum(o_add, axis=1))
                # pad the draw axis to nblk * d_c with zero-weight draws
                dpad = n_draw_pad - n_draw
                q_p = jnp.concatenate(
                    [q_d, jnp.broadcast_to(q_d[:, :1],
                                           q_d.shape[:1] + (dpad, 4))], 1)
                t_p = jnp.concatenate(
                    [t_rel, jnp.zeros(t_rel.shape[:1] + (dpad, 2),
                                      t_rel.dtype)], 1)
                dmask = (jnp.arange(n_draw_pad) < n_draw).astype(real_dtype)
                b_sz = q_d.shape[0]
                q_b = jnp.moveaxis(
                    q_p.reshape(b_sz, nblk, d_c, 4), 1, 0)
                t_b = jnp.moveaxis(
                    t_p.reshape(b_sz, nblk, d_c, 2), 1, 0)
                m_b = dmask.reshape(nblk, d_c)

                def blk_step(tab_lane, args_b):
                    q_1, t_1, m_1 = args_b  # (B, d_c, 4/2), (d_c,)
                    rots = _rot_mats(q_1, mode)  # (B, d_c, 3, 3)
                    coords = projector.slice_coords_3d(rots, col_, row_,
                                                       pf=pf)
                    tra = translation_phase(col_, row_, -t_1[..., 0],
                                            -t_1[..., 1], n)
                    wv = (w[:, None, None] * m_1[None, :, None]
                          * pmask_).astype(real_dtype)
                    fv = d[:, None, :] * tra * c[:, None, :] * wv
                    tv = jnp.broadcast_to((c[:, None, :] ** 2) * wv,
                                          fv.shape)
                    base = jnp.floor(coords)
                    bi = base.astype(jnp.int32) + mc // 2
                    idx = (bi[..., 0] * mc + bi[..., 1]) * mc + bi[..., 2]
                    valid = jnp.all((bi >= 0) & (bi < mc - 1), axis=-1)
                    idx = idx + (cls * n_vox)[:, None, None]
                    idx = jnp.where(valid, idx, k_classes * n_vox)
                    frac = (coords - base).astype(jnp.float32)
                    tab_lane = pallas_insert.sorted_insert_update(
                        tab_lane, idx.reshape(-1),
                        fv.real.reshape(-1), fv.imag.reshape(-1),
                        tv.reshape(-1), frac.reshape(-1, 3),
                        interpret=interp)
                    return tab_lane, 0.0

                tab_lane, _ = jax.lax.scan(blk_step, tab_lane,
                                           (q_b, t_b, m_b))
                return (tab_lane, off), 0.0

            def chunk_step(carry, args):
                tab, off = carry
                d, c, ky, w, o_img, r_sup, t_sup, cls = args
                k1 = jax.vmap(lambda k: jax.random.fold_in(k, 101))(ky)
                k2 = jax.vmap(lambda k: jax.random.fold_in(k, 102))(ky)
                ri = jax.vmap(
                    lambda k: jax.random.randint(k, (n_draw,), 0,
                                                 r_sup.shape[1]))(k1)
                ti = jax.vmap(
                    lambda k: jax.random.randint(k, (n_draw,), 0,
                                                 t_sup.shape[1]))(k2)
                q_d = jnp.take_along_axis(r_sup, ri[..., None], axis=1)
                t_d = jnp.take_along_axis(t_sup, ti[..., None], axis=1)
                t_rel = t_d - o_img[:, None, :]  # tran - offset
                # scan over the draw axis: vectorizing all n_draw poses
                # materializes (B * n_draw * P, corners) scatter temps —
                # ~2-6 GB per chunk at the Nyquist band (OOM); per-draw the
                # temp is B * P * corners and the scatter cost per sample
                # is unchanged (it dominates either way)
                def draw_step(carry, args1):
                    tab, off = carry
                    q_1, t_rel1 = args1  # (B, 4)/(B, 2) one draw per image
                    rots = _rot_mats(q_1[:, None], mode)  # (B, 1, d, d)
                    if mode == "2d":
                        coords = projector.slice_coords_2d(rots, col_, row_,
                                                           pf=pf)
                    else:
                        coords = projector.slice_coords_3d(rots, col_, row_,
                                                           pf=pf)
                    tra = translation_phase(col_, row_, -t_rel1[:, None, 0],
                                            -t_rel1[:, None, 1], n)
                    wv = (w[:, None, None] * pmask_).astype(real_dtype)
                    fv = d[:, None, :] * tra * c[:, None, :] * wv
                    tv = (c[:, None, :] ** 2) * wv
                    tab = _fused_class_insert(tab, coords, cls, fv, tv, mc,
                                              mode, kernel=insert_kernel,
                                              blob_a=blob_a, alpha=alpha)
                    # per-class re-centring accumulator: dir = -rot(t-off,0)
                    if mode == "2d":
                        dirv = -jnp.einsum("bnij,bnj->bni", rots,
                                           t_rel1[:, None])
                        dirv = jnp.concatenate(
                            [dirv, jnp.zeros_like(dirv[..., :1])], -1)
                    else:
                        t3 = jnp.concatenate(
                            [t_rel1[:, None],
                             jnp.zeros_like(t_rel1[:, None, :1])], -1)
                        dirv = -jnp.einsum("bnij,bnj->bni", rots, t3)
                    cnt = jnp.broadcast_to(
                        w[:, None] > 0, dirv.shape[:2]).astype(real_dtype)
                    o_add = jnp.concatenate(
                        [dirv * cnt[..., None], cnt[..., None]], -1)
                    off = off.at[cls].add(jnp.sum(o_add, axis=1))
                    return (tab, off), 0.0

                (tab, off), _ = jax.lax.scan(
                    draw_step, (tab, off),
                    (jnp.moveaxis(q_d, 1, 0), jnp.moveaxis(t_rel, 1, 0)))
                return (tab, off), 0.0

            if use_sorted:
                tab0 = jnp.zeros(
                    (24, pallas_insert.rows_pad(k_classes * n_vox + 1)),
                    jnp.float32)
                step_fn = chunk_step_sorted
            else:
                tab0 = jnp.zeros((k_classes * n_vox + 1, width),
                                 jnp.float32)
                step_fn = chunk_step
            off0 = jnp.zeros((k_classes, 4), real_dtype)
            (tab, off), _ = jax.lax.scan(step_fn, (tab0, off0), (
                _chunked(dat[h], chunk), _chunked(ctf[h], chunk),
                _chunked(keys[h], chunk),
                _chunked(w_img[h], chunk, zero_pad=True),
                _chunked(tra_off[h], chunk),
                _chunked(st_h["r"], chunk), _chunked(st_h["t"], chunk),
                _chunked(st_h["c"], chunk),
            ))
            # fold this device's partial table NOW (linear: psum commutes)
            # so the next half's table can reuse its HBM, and psum the
            # 3-channel voxel arrays instead of the 24-wide brick table
            def fold_class(kc):
                if use_sorted:
                    # fold_insert3_lane reads [:mc^3] of the lane axis
                    return brick_ops.fold_insert3_lane(
                        tab[:, kc * n_vox:], mc)
                # fold ignores the trailing row ([:-1]); for kc < K-1 the
                # next class's first row stands in for the drop row
                sub = jax.lax.slice_in_dim(tab, kc * n_vox,
                                           (kc + 1) * n_vox + 1, axis=0)
                return fold(sub)

            if k_classes == 1:
                f_c, t_c = fold_class(0)
            else:
                parts = [fold_class(kc) for kc in range(k_classes)]
                f_c = jnp.stack([p[0] for p in parts])
                t_c = jnp.stack([p[1] for p in parts])
            f_c = jax.lax.psum(f_c, DATA_AXIS)
            t_c = jax.lax.psum(t_c, DATA_AXIS)
            if apply_sym and mode != "2d" and (sym_rots_.shape[0]
                                               or exact_ops):
                # (mc//2 - 2)/pf == the r_u this mc was cropped for
                # (brick.crop_size); replicated compute post-psum.
                # ``apply_sym=False`` defers it (symmetrize_halves) when
                # the host accumulates the insert over image segments —
                # symmetrization is linear, so sym(sum) == sum(sym), and
                # repeating the expensive whole-grid gather per segment
                # would waste it
                def sym_one(f0, t0):
                    fo, to = reconstructor.symmetrize_exact(
                        f0, t0, exact_ops, (mc // 2 - 2) / pf, pf=pf)
                    if sym_rots_.shape[0]:
                        f_g, t_g = reconstructor.symmetrize_cropped(
                            f0, t0, sym_rots_, (mc // 2 - 2) / pf, pf=pf)
                        fo = fo + (f_g - f0)
                        to = to + (t_g - t0)
                    return fo, to

                if k_classes == 1:
                    f_c, t_c = sym_one(f_c, t_c)
                else:
                    parts = [sym_one(f_c[kc], t_c[kc])
                             for kc in range(k_classes)]
                    f_c = jnp.stack([p[0] for p in parts])
                    t_c = jnp.stack([p[1] for p in parts])
            f_hs.append(f_c)
            t_hs.append(t_c)
            offs.append(jax.lax.psum(off, DATA_AXIS))
        return jnp.stack(f_hs), jnp.stack(t_hs), jnp.stack(offs)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(),) * 3 + (P(HALF_AXIS, DATA_AXIS),) * 6 + (P(),),
        out_specs=(P(HALF_AXIS), P(HALF_AXIS), P(HALF_AXIS)),
        check_vma=False,
    )(col, row, pmask, dat_ori, ctf, state, keys, w_img, tra_off, sym_rots)


@partial(jax.jit, static_argnames=("mesh", "pf", "r_u", "exact_ops"))
def symmetrize_halves(mesh, f, t, sym_rots, *, pf, r_u, exact_ops=()):
    """Point-group symmetrization of per-half folded (F, T) voxel arrays,
    each half on its own mesh row (Reconstructor::symmetrizeF/T,
    src/Reconstructor.cpp:2676-2692). Used by the segmented insert path
    (insert_fold_reduce apply_sym=False).

    exact_ops: grid-exact rotations as transpose/flip descriptors
    (reconstructor.split_grid_exact) — sym_rots should then hold only the
    remaining general rotations."""
    from ..core import reconstructor

    lh = 2 // mesh.shape[HALF_AXIS]

    def local(f, t, sym_rots_):
        fs, ts = [], []
        for h in range(lh):
            f_c, t_c = reconstructor.symmetrize_exact(
                f[h], t[h], exact_ops, r_u, pf=pf)
            if sym_rots_.shape[0]:
                # general rotations gather from the ORIGINAL arrays
                f_g, t_g = reconstructor.symmetrize_cropped(
                    f[h], t[h], sym_rots_, r_u, pf=pf)
                f_c = f_c + (f_g - f[h])
                t_c = t_c + (t_g - t[h])
            fs.append(f_c)
            ts.append(t_c)
        return jnp.stack(fs), jnp.stack(ts)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(HALF_AXIS), P(HALF_AXIS), P()),
        out_specs=(P(HALF_AXIS), P(HALF_AXIS)),
        check_vma=False,
    )(f, t, sym_rots)


# ---------------------------------------------------- per-half reconstruction

@partial(jax.jit, static_argnames=("mesh", "mode", "pf", "n",
                                   "join_half", "insert_kernel", "warm",
                                   "blob_a", "blob_alpha"))
def reconstruct_halves(mesh, f, t, fsc, w0, r_u, *, mode, pf, n, join_half,
                       insert_kernel="trilinear", warm=False, blob_a=1.9,
                       blob_alpha=15.0):
    """Per-half Wiener/C-balance reconstruction from folded+symmetrized
    (F, T) voxel arrays (insert_fold_reduce) — each hemisphere on ITS OWN
    mesh row (Reconstructor::reconstruct src/Reconstructor.cpp:1129-1835,
    run by each hemisphere's lead independently).

    f/t: (2, mc^d..) sharded P(half); fsc: (n//2,) replicated; w0:
    (2, mc^d..) C-balance warm-start weights, used when ``warm`` (pass the
    previous round's converged weights for the same band — same stopping
    rule, fewer iterations); r_u: scalar reconstruction radius (traced —
    the ladder moves it every round, only the grid shape is static).
    Returns (volumes (2, [n,] n, n), converged weights (2, mc^d..)), both
    sharded P(half)."""
    from ..core import reconstructor

    dims = 2 if mode == "2d" else 3
    lh = 2 // mesh.shape[HALF_AXIS]

    def local(f, t, fsc, w0, r_u_):
        # vmap over this device's halves (2 on a 1-row mesh): the two
        # C-balance loops run as ONE batched-FFT while_loop — a batched
        # iteration measured 86.6 ms vs 2 x 55.5 ms sequential at the
        # bench band (scripts/wiener_probe.py, r5)
        def one(fh, th, w0h):
            return reconstructor.reconstruct_cropped(
                fh, th, fsc, n, pf=pf, max_radius=r_u_,
                join_half=join_half, dims=dims,
                insert_kernel=insert_kernel, blob_a=blob_a,
                blob_alpha=blob_alpha,
                w_init=w0h if warm else None, return_w=True)

        return jax.vmap(one)(f, t, w0)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(HALF_AXIS), P(HALF_AXIS), P(), P(HALF_AXIS), P()),
        out_specs=(P(HALF_AXIS), P(HALF_AXIS)),
        check_vma=False,
    )(f, t, fsc, w0, r_u)


# -------------------------------------------------------- M-step statistics

@partial(jax.jit, static_argnames=("mesh", "mode", "pf", "n", "n_groups",
                                   "n_shell", "chunk", "p_in"))
def residual_stats(mesh, bricks, col, row, sig_idx, pmask, dat, dat_ori,
                   ctf, state, groups, valid, tra_off,
                   *, mode, pf, n, n_groups, n_shell, chunk, p_in=0):
    """One pass of rank-1-pose residual statistics for the M-step, reduced
    with ``psum((half, data))`` — the reference's slave-communicator
    allreduces (allReduceSigma src/Optimiser.cpp:6397, refreshScale :5749,
    normCorrection :6201).

    Per image, project its class at its rank-1 rotation and translate by
    (topT - offset) for the ORI stack / topT for the masked stack, then
    accumulate per-shell sums:
      - sig:   (G, n_shell) sum over group images of |datOri - ctf pri|^2
               with (G,) counts            [sigma, ori stack]
      - xa/aa: (G, n_shell) scale-fit terms Re(dat conj(ctf pri)), |ctf pri|^2
               [scale, ori stack]
      - norm:  (2, S, n_shell) per-image residual shells [norm, masked stack]
      - ori:   (2, S, n_shell, 3) per-image ori-stack shells
               [|datOri|^2, Re(datOri conj(ctf pri)), |ctf pri|^2] — lets
               sigma be re-derived EXACTLY after a per-image rescale
               (norm correction scales datOri by fac:
               |fac d - cp|^2 = fac^2 dd - 2 fac xa + aa) without a second
               projection pass (sigma_rescaled)

    tra_off: (2, S, 2) accumulated re-centring offsets. Shell selection into
    frequency bands happens on the host (bands are iteration-dependent).
    """
    lh = 2 // mesh.shape[HALF_AXIS]

    def local(bricks, col_, row_, sig_idx_, pmask_, dat, dat_ori, ctf,
              state, groups, valid, tra_off):
        sig = jnp.zeros((n_groups, n_shell), jnp.float32)
        cnt = jnp.zeros((n_groups,), jnp.float32)
        xa = jnp.zeros((n_groups, n_shell), jnp.float32)
        aa = jnp.zeros((n_groups, n_shell), jnp.float32)
        big, inner = _split_bricks(bricks)
        norms, oris = [], []
        for h in range(lh):
            mc, half_t = _brick_geom(big, mode)
            n_chan = big.shape[-1]
            flat = big[h].reshape((-1, n_chan))
            flat_in, mc_in = None, 0
            if inner is not None:
                mc_in = inner.shape[-2]
                flat_in = inner[h].reshape((-1, n_chan))
            st_h = jax.tree.map(lambda x: x[h], state)
            s_loc = dat.shape[1]

            def chunk_step(carry, args):
                sig, cnt, xa, aa = carry
                d, d_o, c, g, v, off, topr, topt, cls = args
                rots = _rot_mats(topr[:, None], mode)  # (B, 1, d, d)
                if mode == "2d":
                    coords = projector.slice_coords_2d(rots, col_, row_,
                                                       pf=pf)
                else:
                    coords = projector.slice_coords_3d(rots, col_, row_,
                                                       pf=pf)
                pri = _tier_gather(flat, flat_in, coords, cls, mc, mc_in,
                                   mode, half_t, p_in)[:, 0]
                t_o = topt - off
                tra_o = translation_phase(col_, row_, t_o[:, 0], t_o[:, 1], n)
                tra_m = translation_phase(col_, row_, topt[:, 0],
                                          topt[:, 1], n)
                pm = pmask_ * v[:, None]
                res_o = jnp.abs(d_o - c * pri * tra_o) ** 2 * pm
                res_m = jnp.abs(d - c * pri * tra_m) ** 2 * pm
                cp_o = c * pri * tra_o
                dd_l = (d_o.real**2 + d_o.imag**2) * pm
                xa_l = (jnp.conj(d_o) * cp_o).real * pm
                aa_l = (cp_o.real**2 + cp_o.imag**2) * pm

                def to_shell(x):  # (B, P) -> (B, n_shell)
                    z = jnp.zeros(x.shape[:-1] + (n_shell,), jnp.float32)
                    return z.at[..., sig_idx_].add(x)

                sh_o = to_shell(res_o)
                sh_m = to_shell(res_m)
                sh_xa = to_shell(xa_l)
                sh_aa = to_shell(aa_l)
                sig2 = sig.at[g].add(sh_o)
                cnt2 = cnt.at[g].add(v)
                xa2 = xa.at[g].add(sh_xa)
                aa2 = aa.at[g].add(sh_aa)
                ori_img = jnp.stack([to_shell(dd_l), sh_xa, sh_aa], -1)
                return (sig2, cnt2, xa2, aa2), (sh_m, ori_img)

            (sig, cnt, xa, aa), (norm_c, ori_c) = jax.lax.scan(
                chunk_step, (sig, cnt, xa, aa), (
                    _chunked(dat[h], chunk), _chunked(dat_ori[h], chunk),
                    _chunked(ctf[h], chunk), _chunked(groups[h], chunk),
                    _chunked(valid[h], chunk, zero_pad=True),
                    _chunked(tra_off[h], chunk),
                    _chunked(st_h["topR"], chunk),
                    _chunked(st_h["topT"], chunk),
                    _chunked(st_h["c"], chunk),
                ))
            norms.append(_unchunked(norm_c, s_loc))
            oris.append(_unchunked(ori_c, s_loc))
        sig = jax.lax.psum(sig, (HALF_AXIS, DATA_AXIS))
        cnt = jax.lax.psum(cnt, (HALF_AXIS, DATA_AXIS))
        xa = jax.lax.psum(xa, (HALF_AXIS, DATA_AXIS))
        aa = jax.lax.psum(aa, (HALF_AXIS, DATA_AXIS))
        return sig, cnt, xa, aa, jnp.stack(norms), jnp.stack(oris)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(_brick_spec(bricks),) + (P(),) * 4
        + (P(HALF_AXIS, DATA_AXIS),) * 7,
        out_specs=(P(), P(), P(), P(), P(HALF_AXIS, DATA_AXIS),
                   P(HALF_AXIS, DATA_AXIS)),
        check_vma=False,
    )(bricks, col, row, sig_idx, pmask, dat, dat_ori, ctf, state, groups,
      valid, tra_off)


@partial(jax.jit, static_argnames=("mesh", "n_groups"))
def sigma_rescaled(mesh, ori_img, fac, groups, valid, *, n_groups):
    """Per-group sigma shell sums AFTER a per-image rescale, from the
    residual pass's per-image ori-stack shells (residual_stats ``ori``):
    sig_g = sum_{l in g} fac_l^2 dd_l - 2 fac_l xa_l + aa_l — algebraically
    identical to re-measuring |fac datOri - ctf pri|^2 (the reference's
    allReduceSigma after normCorrection, src/Optimiser.cpp:3405-3419)
    without the second projection pass.

    ori_img: (2, S, n_shell, 3); fac: (2, S) norm-correction factors;
    groups/valid: (2, S). Returns psum'd ((G, n_shell), (G,))."""

    def local(ori, fac_, g, v):
        f = fac_[..., None]
        sig_img = (f * f * ori[..., 0] - 2.0 * f * ori[..., 1]
                   + ori[..., 2]) * v[..., None]
        sig = jnp.zeros((n_groups, sig_img.shape[-1]), jnp.float32)
        cnt = jnp.zeros((n_groups,), jnp.float32)
        sig = sig.at[g.reshape(-1)].add(sig_img.reshape(-1,
                                                        sig_img.shape[-1]))
        cnt = cnt.at[g.reshape(-1)].add(v.reshape(-1))
        return (jax.lax.psum(sig, (HALF_AXIS, DATA_AXIS)),
                jax.lax.psum(cnt, (HALF_AXIS, DATA_AXIS)))

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(HALF_AXIS, DATA_AXIS),) * 4,
        out_specs=(P(), P()),
        check_vma=False,
    )(ori_img, fac, groups, valid)
