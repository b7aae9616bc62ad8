"""Point-group symmetry (C_n, D_n, T, O, I1-I4).

Group elements are generated host-side (NumPy, float64) once per run and then
used on-device as a stacked array of rotation matrices / quaternions.

Semantics match the reference:
- symbol parsing (src/Geometry/SymmetryFunctions.cpp:13-63),
- generator axes per group (SymmetryFunctions.cpp:65-148),
- closure under products until no new element appears
  (src/Geometry/Symmetry.cpp:250-277 ``completePointGroup``),
- the identity is NOT stored; ``n_elements`` equals the reference's
  ``nSymmetryElement()`` = |G| - 1.
- ``symmetry_counterpart`` maps a quaternion to the group coset member
  maximizing |<q, anchor>| (Symmetry.cpp:309-337); anchor defaults to the
  identity quaternion (ANCHOR_POINT_2, include/Geometry/Symmetry.h:75).
"""

import re

import numpy as np

import jax.numpy as jnp

_SAME_TOL = 1e-4


def _axis_angle_matrix(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    w = np.cos(angle / 2)
    x, y, z = np.sin(angle / 2) * axis
    return _quat_to_matrix(np.array([w, x, y, z]))


def _quat_to_matrix(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _matrix_to_quat(m):
    w = 0.5 * np.sqrt(max(0.0, 1 + m[0, 0] + m[1, 1] + m[2, 2]))
    x = 0.5 * np.sqrt(max(0.0, 1 + m[0, 0] - m[1, 1] - m[2, 2]))
    y = 0.5 * np.sqrt(max(0.0, 1 - m[0, 0] + m[1, 1] - m[2, 2]))
    z = 0.5 * np.sqrt(max(0.0, 1 - m[0, 0] - m[1, 1] + m[2, 2]))
    x = np.copysign(x, m[2, 1] - m[1, 2])
    y = np.copysign(y, m[0, 2] - m[2, 0])
    z = np.copysign(z, m[1, 0] - m[0, 1])
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


# generator table: group -> list of (fold, axis); axes from
# SymmetryFunctions.cpp:65-148 (icosahedral conventions I1-I4)
_GENERATORS = {
    "T": [(3, (0, 0, 1)), (2, (0, 0.816496, 0.577350))],
    "O": [(3, (0.5773502, 0.5773502, 0.5773502)), (4, (0, 0, 1))],
    "I1": [
        (2, (1, 0, 0)),
        (5, (0.8506508, 0, -0.5257311)),
        (3, (0.9341724, 0.3568221, 0)),
    ],
    "I2": [
        (2, (0, 0, 1)),
        (5, (0.5257311, 0, 0.8506508)),
        (3, (0, 0.3568221, 0.9341724)),
    ],
    "I3": [
        (2, (-0.5257311, 0, 0.8506508)),
        (5, (0, 0, 1)),
        (3, (-0.4911235, 0.3568221, 0.7946545)),
    ],
    "I4": [
        (2, (0.5257311, 0, 0.8506508)),
        (5, (0.8944272, 0, 0.4472136)),
        (3, (0.4911235, 0.3568221, 0.7946545)),
    ],
}


def _parse(symbol):
    symbol = symbol.strip().upper()
    if symbol == "I":
        symbol = "I2"  # common alias
    m = re.fullmatch(r"C(\d+)", symbol)
    if m:
        return [(int(m.group(1)), (0, 0, 1))]
    m = re.fullmatch(r"D(\d+)", symbol)
    if m:
        return [(int(m.group(1)), (0, 0, 1)), (2, (1, 0, 0))]
    if symbol in _GENERATORS:
        return _GENERATORS[symbol]
    raise ValueError(f"invalid symmetry symbol: {symbol!r}")


def _novo(mats, m):
    for e in mats:
        if np.max(np.abs(e - m)) < _SAME_TOL:
            return False
    return np.max(np.abs(m - np.eye(3))) >= _SAME_TOL


class Symmetry:
    """All non-identity elements of a point group, as (N,3,3) matrices and
    (N,4) quaternions (host NumPy) plus device copies."""

    def __init__(self, symbol="C1"):
        self.symbol = symbol.strip().upper()
        mats = []
        for fold, axis in _parse(symbol):
            angle = 2 * np.pi / fold
            for j in range(1, fold):
                r = _axis_angle_matrix(axis, angle * j)
                if _novo(mats, r):
                    mats.append(r)
        # close under products (completePointGroup, Symmetry.cpp:250-277)
        changed = True
        while changed:
            changed = False
            for i in range(len(mats)):
                for j in range(len(mats)):
                    r = mats[i] @ mats[j]
                    if _novo(mats, r):
                        mats.append(r)
                        changed = True
        self.rot = np.stack(mats) if mats else np.zeros((0, 3, 3))
        self.quat = (
            np.stack([_matrix_to_quat(m) for m in mats])
            if mats
            else np.zeros((0, 4))
        )

    @property
    def n_elements(self):
        """|G| - 1, matching the reference's nSymmetryElement()."""
        return len(self.rot)

    def is_asymmetric(self):
        return self.n_elements == 0

    def rot_with_identity(self):
        """(|G|, 3, 3) including the identity, for symmetrization loops."""
        return np.concatenate([np.eye(3)[None], self.rot], axis=0)

    def quat_with_identity(self):
        e = np.array([[1.0, 0.0, 0.0, 0.0]])
        return np.concatenate([e, self.quat], axis=0)


def symmetry_counterpart(q, sym_quats, anchor=None):
    """Map quaternions (..., 4) into the fundamental domain: among
    {conj(g) * q : g in G u {e}} pick the one maximizing |<., anchor>|.

    ``sym_quats``: (M, 4) group quaternions WITHOUT identity.
    Vectorized equivalent of Symmetry.cpp:309-337.
    """
    from .quat import quat_mul, quat_conj

    if anchor is None:
        anchor = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=q.dtype)
    sym_quats = jnp.asarray(sym_quats, dtype=q.dtype)
    if sym_quats.shape[0] == 0:
        return q
    # candidates: original + conj(g) q for each g; reshape the group to
    # (M, 1...1, 4) so batched q of ANY rank broadcasts (leading-axis
    # alignment — trailing alignment breaks for |G| > 1 with rank-3 q)
    g = quat_conj(sym_quats).reshape(
        (sym_quats.shape[0],) + (1,) * (q.ndim - 1) + (4,))
    cand = quat_mul(g, q[None, ...])  # (M, ..., 4)
    cand = jnp.concatenate([q[None, ...], cand], axis=0)  # (M+1, ..., 4)
    score = jnp.abs(jnp.sum(cand * anchor, axis=-1))  # (M+1, ...)
    best = jnp.argmax(score, axis=0)  # (...)
    return jnp.take_along_axis(cand, best[None, ..., None], axis=0)[0]
