"""Real-space masks: soft (cosine-edge) spherical masks, background
estimation, auto mask generation.

Matches src/Functions/Mask.cpp: softMask cosine edge (:470-520), background
as the mean outside radius r + edge (:213-270), genMask =
threshold -> extend -> soft edge (:694-731) implemented with separable
max/min filters instead of per-voxel neighbourhood scans.
All inputs are real-space arrays with the object centered at N//2.
"""

import jax.numpy as jnp


def _radius_rl(shape):
    """Real-space distance from the center voxel, matching signed indexing
    i in [-n/2, n/2)."""
    grids = []
    for ax, n in enumerate(shape):
        f = jnp.arange(n, dtype=jnp.float32) - n // 2
        s = [1] * len(shape)
        s[ax] = n
        grids.append(f.reshape(s))
    r2 = sum(g**2 for g in grids)
    return jnp.sqrt(r2)


def soft_mask_shape(shape, r, ew):
    """Spherical mask: 1 inside r, cosine falloff over ew, 0 outside
    (Mask.cpp:470-487)."""
    u = _radius_rl(shape)
    return jnp.where(
        u > r + ew,
        0.0,
        jnp.where(u >= r, 0.5 + 0.5 * jnp.cos((u - r) / ew * jnp.pi), 1.0),
    ).astype(jnp.float32)


def background(vol, r, ew):
    """Mean value outside radius r + ew (Mask.cpp:213-247 weighted form:
    cosine-transition voxels count fractionally)."""
    u = _radius_rl(vol.shape)
    w = jnp.where(
        u > r + ew,
        1.0,
        jnp.where(u >= r, 0.5 - 0.5 * jnp.cos((u - r) / ew * jnp.pi), 0.0),
    )
    return jnp.sum(w * vol) / jnp.maximum(jnp.sum(w), 1e-30)


def soft_mask(vol, r, ew, bg=None):
    """Blend vol into the (estimated) background outside the soft sphere
    (Mask.cpp:499-521)."""
    if bg is None:
        bg = background(vol, r, ew)
    alpha = soft_mask_shape(vol.shape, r, ew)
    return bg * (1 - alpha) + vol * alpha


def apply_soft_mask(vol, alpha, bg=0.0):
    """Generic alpha mask blend (Mask.cpp:523-544)."""
    return bg * (1 - alpha) + vol * alpha


# ------------------------------------------------- auto mask (genMask)
# Mask generation is a rare host-side operation (once per run at most);
# the reference's per-voxel neighbourhood scans map onto NumPy/SciPy exact
# Euclidean distance transforms rather than device kernels.

GEN_MASK_INIT_STEP = 0.2  # include/Functions/Mask.h:31
GEN_MASK_GAP = 0.05       # include/Functions/Mask.h:33


def remove_isolated_points(binary):
    """Zero 1-voxels with no face-adjacent 1-neighbour
    (removeIsolatedPoint, Mask.cpp:560-586). Out-of-bounds neighbours
    count as 0, matching the reference's bounds checks."""
    import numpy as np

    b = np.asarray(binary) > 0.5
    has = np.zeros_like(b)
    for ax in range(b.ndim):
        lo = [slice(None)] * b.ndim
        hi = [slice(None)] * b.ndim
        lo[ax] = slice(None, -1)
        hi[ax] = slice(1, None)
        has[tuple(lo)] |= b[tuple(hi)]
        has[tuple(hi)] |= b[tuple(lo)]
    return (b & has).astype(np.float32)


def ext_mask(binary, ext):
    """Extend (ext > 0) / shrink (ext < 0) a binary mask by a Euclidean
    ball of radius |ext| (extMask, Mask.cpp:588-650; strict d < |ext|)."""
    import numpy as np
    from scipy.ndimage import distance_transform_edt

    b = np.asarray(binary) > 0.5
    if ext > 0:
        d = distance_transform_edt(~b)
        return (b | (d < ext)).astype(np.float32)
    if ext < 0:
        d = distance_transform_edt(b)
        return (b & (d >= -ext)).astype(np.float32)
    return b.astype(np.float32)


def soft_edge(binary, ew):
    """Cosine soft edge of width ew on a binary mask: value 0.5 +
    0.5 cos(d / ew * pi) at Euclidean distance d < ew from the mask
    (softEdge, Mask.cpp:652-692)."""
    import numpy as np
    from scipy.ndimage import distance_transform_edt

    b = np.asarray(binary) > 0.5
    d = distance_transform_edt(~b)
    out = np.where(b, 1.0, np.where(
        d < ew, 0.5 + 0.5 * np.cos(d / max(ew, 1e-6) * np.pi), 0.0))
    return out.astype(np.float32)


def auto_mask_threshold(vol, r):
    """The reference's partial-sum density search (autoMask,
    Mask.cpp:733-790): sort the positive in-sphere densities descending,
    walk cumulative-mass bins of GEN_MASK_GAP starting past
    GEN_MASK_INIT_STEP, and stop when a bin needs more than twice the
    average number of voxels per previous bin — the knee of the density
    histogram. Returns the threshold density."""
    import numpy as np

    v = np.asarray(vol)
    u = np.asarray(_radius_rl(v.shape))
    data = np.maximum(v[u < r], 0.0)
    data = np.sort(data)[::-1].astype(np.float64)
    n = data.size
    partial = np.cumsum(data)
    total = partial[-1]
    if total <= 0:
        return 0.0
    start = int(np.searchsorted(partial, total * GEN_MASK_INIT_STEP))
    step = GEN_MASK_INIT_STEP + GEN_MASK_GAP
    n_prev_bin = 0
    prev = 0
    bin_ = 0
    thres = 0.0
    for i in range(start, n):
        if partial[i] < total * step:
            bin_ += 1
        else:
            if n_prev_bin != 0 and prev * 2 < bin_ * n_prev_bin:
                break
            step += GEN_MASK_GAP
            n_prev_bin += 1
            prev += bin_
            bin_ = 0
            thres = data[i]
    return float(thres)


def gen_mask(vol, thres, ext, ew):
    """genMask (Mask.cpp:694-731): threshold -> remove isolated points ->
    Euclidean-ball extend -> cosine soft edge. Returns float32 in [0, 1]."""
    import numpy as np

    binary = (np.asarray(vol) > thres).astype(np.float32)
    binary = remove_isolated_points(binary)
    binary = ext_mask(binary, ext)
    return soft_edge(binary, ew)


def auto_mask(vol, ext, ew, r):
    """autoMask (Mask.cpp:793-811): partial-sum threshold search within
    radius r, then genMask."""
    return gen_mask(vol, auto_mask_threshold(vol, r), ext, ew)


def shell_mask(shape, inner, outer, ew):
    """Shell mask: 1 between inner and outer radius, cosine edges of width
    ew on both sides (appsrc/thunder_genmask_shell.cpp:140-200). The
    reference's literal profile cos((d - r)/ew) + 0.5 stays >= 1 across the
    whole edge (it clamps to 1 then jumps to 0 — an upstream bug); the
    intended smooth falloff 0.5 + 0.5 cos(pi (d - r)/ew) is used instead,
    matching every other soft edge in the codebase (softMask profile,
    Mask.cpp:470-487)."""
    u = _radius_rl(shape)
    fall_in = 0.5 + 0.5 * jnp.cos((inner - u) / ew * jnp.pi)
    fall_out = 0.5 + 0.5 * jnp.cos((u - outer) / ew * jnp.pi)
    val = jnp.where(
        u < inner - ew, 0.0,
        jnp.where(u < inner, fall_in,
                  jnp.where(u < outer, 1.0,
                            jnp.where(u < outer + ew, fall_out, 0.0))))
    return jnp.clip(val, 0.0, 1.0).astype(jnp.float32)
