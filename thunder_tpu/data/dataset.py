"""Particle dataset: .thu metadata + MRC stack loading.

Replaces the reference Database + per-rank image loading
(src/Database.cpp:207-645, Optimiser::initImg src/Optimiser.cpp:4608-4660):
the master-rank shuffle/split becomes a seeded host-side permutation; each
host reads only its own shard's stack slices (per-slice MRC reads). The
shuffled half split preserves the golden-standard semantics (odd/even ranks
-> first/second half of the permutation).
"""

import os
from collections import defaultdict

import numpy as np

from ..io import mrc
from ..io.thu import ThuColumns, read_thu


class ParticleDataset:
    def __init__(self, thu_path, particle_prefix="", seed=0):
        self.table = read_thu(thu_path)
        self.prefix = particle_prefix
        self.n = len(self.table)
        rng = np.random.default_rng(seed)
        self.permutation = rng.permutation(self.n)
        # golden-standard half split over the shuffled order
        # (Database::shuffle + split, src/Database.cpp:235, 621-645)
        self.halves = np.zeros(self.n, np.int32)
        self.halves[self.permutation[self.n // 2:]] = 1

    @property
    def group_ids(self):
        g = self.table.col(ThuColumns.GROUP_ID).astype(np.int32)
        # reference group ids are 1-based
        return np.maximum(g - 1, 0)

    def ctf_params(self):
        t = self.table
        return {
            "voltage": t.col(ThuColumns.VOLTAGE).astype(np.float32),
            "defocus_u": t.col(ThuColumns.DEFOCUS_U).astype(np.float32),
            "defocus_v": t.col(ThuColumns.DEFOCUS_V).astype(np.float32),
            "defocus_theta": t.col(ThuColumns.DEFOCUS_THETA).astype(np.float32),
            "cs": t.col(ThuColumns.CS).astype(np.float32),
            "amp_contrast": t.col(ThuColumns.AMPLITUDE_CONTRAST).astype(np.float32),
            "phase_shift": t.col(ThuColumns.PHASE_SHIFT).astype(np.float32),
        }

    def poses(self):
        """(quat (N,4), trans (N,2), defocus factor (N,), class (N,))."""
        t = self.table
        q = t.values[:, ThuColumns.QUAT_0 : ThuColumns.QUAT_3 + 1]
        tr = t.values[:, ThuColumns.TRANSLATION_X : ThuColumns.TRANSLATION_Y + 1]
        d = t.col(ThuColumns.DEFOCUS_FACTOR)
        c = t.col(ThuColumns.CLASS_ID).astype(np.int32)
        return (q.astype(np.float32), tr.astype(np.float32),
                d.astype(np.float32), c)

    def load_images(self, indices=None):
        """Read the particle images for ``indices`` (default: all), grouping
        reads per stack file for IO efficiency. Returns (len(indices), n, n)
        float32."""
        if indices is None:
            indices = np.arange(self.n)
        by_file = defaultdict(list)
        for pos, i in enumerate(indices):
            slice_idx, fname = mrc.parse_particle_path(self.table.particle_paths[i])
            by_file[fname].append((pos, slice_idx))
        out = None
        for fname, items in by_file.items():
            path = os.path.join(self.prefix, fname) if self.prefix else fname
            slices = mrc.read_stack_slices(path, [s for _, s in items])
            if out is None:
                out = np.empty((len(indices),) + slices.shape[1:], np.float32)
            for (pos, _), img in zip(items, slices):
                out[pos] = img
        return out
