"""Ring-mask pixel index sets for the E-step.

The reference precomputes, for the frequency band [rL, rU), the list of
half-spectrum pixels with their signed frequencies and shell indices
(``allocPreCalIdx``, src/Optimiser.cpp:7991-8041): half plane col >= 0,
skipping (col == 0, row < 0), selected by
    rL^2 <= col^2 + row^2 < rU^2  AND  rL <= round(|f|) < rU,
with shell index sig = round(|f|).

Here the same set is computed host-side (NumPy) and PADDED to a bucket size
(multiple of ``PIXEL_BUCKET``) so jitted kernels see a small number of static
shapes as the frequency ladder grows. Padding entries carry mask = 0 and point
at frequency (0, 0) / shell 0.
"""

from dataclasses import dataclass, field

import numpy as np

# bucket 512: the E-step cost is linear in the padded pixel count (the
# brick gather is per-index), so tighter buckets cut real work — the demo
# band r=40 has 2440 ring pixels, 2560 padded at bucket 512 vs 3072 at
# 1024 vs 4096 at 2048 (17% less gather than 1024 on the dominant phase-B
# stage). The ladder adds ~1 extra compile per run per bucket boundary;
# the persistent compile cache amortizes them across runs.
PIXEL_BUCKET = 512


@dataclass
class PixelRing:
    """Static pixel working set for one (rL, rU) band.

    col/row: (P,) int32 signed integer frequencies (cycles/box)
    sig:     (P,) int32 shell index = round(|f|)
    mask:    (P,) float32, 1 for real pixels, 0 for padding
    n_real:  true number of pixels before padding
    """

    col: np.ndarray
    row: np.ndarray
    sig: np.ndarray
    mask: np.ndarray
    n_real: int
    r_low: float
    r_high: float

    @property
    def n(self):
        return len(self.col)

    def n_inner(self, r):
        """Count of real pixels with |k| <= r. Valid as a static split
        point because real pixels are sorted by |k| (pads at the end
        belong to the outer segment; they are masked out downstream)."""
        u2 = (self.col.astype(np.float64) ** 2
              + self.row.astype(np.float64) ** 2)
        return int(np.count_nonzero((u2 <= float(r) ** 2)
                                    & (self.mask > 0)))


def _bucket_size(n_real, bucket):
    """Smallest allowed padded size >= n_real: {256, 512, 1024} for small
    bands (the global-search / early-ladder rings are tiny — a flat 2048
    floor made round 1 of a 160 px run spend >90% of its E-step on pad
    pixels), then multiples of ``bucket``."""
    for small in (256, 512, 1024):
        if small < bucket and n_real <= small:
            return small
    return max(bucket, int(np.ceil(max(n_real, 1) / bucket)) * bucket)


def pixel_ring(size, r_low, r_high, bucket=PIXEL_BUCKET):
    """Build the padded pixel set for an size x size image band [r_low, r_high)."""
    i = np.arange(0, int(r_high) + 2)  # col freq >= 0
    j = np.arange(-int(r_high) - 1, int(r_high) + 2)
    ii, jj = np.meshgrid(i, j, indexing="ij")
    keep = ~((ii == 0) & (jj < 0))
    u2 = ii.astype(np.float64) ** 2 + jj.astype(np.float64) ** 2
    v = np.rint(np.sqrt(u2))
    keep &= (u2 < r_high**2) & (u2 >= r_low**2)
    keep &= (v < r_high) & (v >= r_low)
    # also stay within the Nyquist square of the actual image
    keep &= (ii < size // 2) & (jj < size // 2) & (jj >= -size // 2)
    col = ii[keep].astype(np.int32)
    row = jj[keep].astype(np.int32)
    sig = v[keep].astype(np.int32)
    # sort real pixels by |k| so a radius-tiered gather can split the
    # pixel axis statically (inner pixels gather from a smaller — faster —
    # table crop; every consumer treats the list as an unordered set)
    order = np.argsort(u2[keep], kind="stable")
    col, row, sig = col[order], row[order], sig[order]
    n_real = len(col)
    n_pad = _bucket_size(n_real, bucket)
    pad = n_pad - n_real
    col = np.concatenate([col, np.zeros(pad, np.int32)])
    row = np.concatenate([row, np.zeros(pad, np.int32)])
    sig = np.concatenate([sig, np.zeros(pad, np.int32)])
    mask = np.concatenate(
        [np.ones(n_real, np.float32), np.zeros(pad, np.float32)]
    )
    return PixelRing(
        col=col, row=row, sig=sig, mask=mask, n_real=n_real,
        r_low=float(r_low), r_high=float(r_high),
    )


def gather_pixels(ft_centered, ring):
    """Gather ring pixels from centered spectra.

    ft_centered: (..., n, n) centered complex spectra; returns (..., P).
    Array index of signed freq (col h, row k) is [k + n//2, h + n//2].
    """
    import jax.numpy as jnp

    n = ft_centered.shape[-1]
    rows = jnp.asarray(ring.row) + n // 2
    cols = jnp.asarray(ring.col) + n // 2
    return ft_centered[..., rows, cols]


def scatter_pixels(values, ring, n, hermitian=True):
    """Scatter (..., P) pixel values back to centered (..., n, n) spectra,
    mirroring each pixel to its Hermitian conjugate when requested (the
    half-plane set only covers col >= 0)."""
    import jax.numpy as jnp

    mask = jnp.asarray(ring.mask, dtype=values.real.dtype)
    values = values * mask
    rows = jnp.asarray(ring.row) + n // 2
    cols = jnp.asarray(ring.col) + n // 2
    out = jnp.zeros(values.shape[:-1] + (n, n), dtype=values.dtype)
    out = out.at[..., rows, cols].add(values, mode="drop")
    if hermitian:
        # mirror of row = -n/2 would land at +n/2 (out of bounds) — dropped
        m_rows = -jnp.asarray(ring.row) + n // 2
        m_cols = -jnp.asarray(ring.col) + n // 2
        # don't double-write self-conjugate pixels (h==0, k==0 kept once via
        # the (0, j<0) exclusion; only (0,0) is self-conjugate in the set)
        self_conj = (jnp.asarray(ring.col) == 0) & (jnp.asarray(ring.row) == 0)
        mirr = jnp.where(self_conj, 0.0, mask) * jnp.conj(values)
        out = out.at[..., m_rows, m_cols].add(mirr, mode="drop")
    return out
