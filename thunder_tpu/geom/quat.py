"""Quaternion / Euler / rotation-matrix conversions, batched for JAX.

Semantics match the reference's conventions (src/Geometry/Euler.cpp):

- quaternions are ``(w, x, y, z)``, unit-norm,
- ``rotate3d`` uses ``R = I + 2 w A + 2 A^2`` with ``A = skew(x, y, z)``
  (Euler.cpp:181-189), the standard body-to-space rotation,
- the Euler angles (phi, theta, psi) are the RELION/ZYZ convention
  (Euler.cpp:158-179 ``rotate3D(phi, theta, psi)``),
- ``swing_twist`` decomposes a quaternion into rotation about ``axis``
  (the twist) and the residual swing (Euler.cpp:294-305).

All functions take arrays with arbitrary leading batch dimensions.
"""

import jax
import jax.numpy as jnp


def quat_mul(a, b):
    """Hamilton product, batched. a, b: (..., 4) -> (..., 4)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize(q, eps=1e-30):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def rotate3d(q):
    """Unit quaternion(s) (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotate2d(phi):
    """Angle(s) -> 2x2 rotation matrix (..., 2, 2)."""
    c, s = jnp.cos(phi), jnp.sin(phi)
    r = jnp.stack([c, -s, s, c], axis=-1)
    return r.reshape(jnp.shape(phi) + (2, 2))


def rotate2d_vec(v):
    """Unit 2-vector(s) (cos, sin) -> 2x2 rotation matrix."""
    c, s = v[..., 0], v[..., 1]
    r = jnp.stack([c, -s, s, c], axis=-1)
    return r.reshape(v.shape[:-1] + (2, 2))


def quat_from_euler(phi, theta, psi):
    """ZYZ (RELION) Euler angles -> quaternion (Euler.cpp:91-99)."""
    return jnp.stack(
        [
            jnp.cos((phi + psi) / 2) * jnp.cos(theta / 2),
            jnp.cos((phi - psi) / 2) * jnp.sin(theta / 2),
            jnp.sin((phi - psi) / 2) * jnp.sin(theta / 2),
            jnp.sin((phi + psi) / 2) * jnp.cos(theta / 2),
        ],
        axis=-1,
    )


def euler_from_quat(q):
    """Quaternion -> (phi, theta, psi), ZYZ convention (Euler.cpp:70-89)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    phi = jnp.arctan2(x * z + w * y, w * x - y * z)
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    ct = jnp.clip(w * w - x * x - y * y + z * z, -1.0, 1.0)
    theta = jnp.arccos(ct)
    psi = jnp.arctan2(x * z - w * y, w * x + y * z)
    psi = jnp.where(psi < 0, psi + 2 * jnp.pi, psi)
    return phi, theta, psi


def quat_from_axis_angle(axis, phi):
    """Axis (..., 3) + angle -> quaternion (Euler.cpp:102-109)."""
    phi = jnp.asarray(phi)
    half = phi[..., None] / 2
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def quat_from_matrix(m):
    """Rotation matrix (..., 3, 3) -> quaternion, Shepperd-style
    (Euler.cpp:112-123): magnitudes from the diagonal, signs from
    off-diagonal differences/sums anchored to a positive w."""
    d0, d1, d2 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    w = 0.5 * jnp.sqrt(jnp.maximum(0.0, 1 + d0 + d1 + d2))
    x = 0.5 * jnp.sqrt(jnp.maximum(0.0, 1 + d0 - d1 - d2))
    y = 0.5 * jnp.sqrt(jnp.maximum(0.0, 1 - d0 + d1 - d2))
    z = 0.5 * jnp.sqrt(jnp.maximum(0.0, 1 - d0 - d1 + d2))
    x = jnp.copysign(x, m[..., 2, 1] - m[..., 1, 2])
    y = jnp.copysign(y, m[..., 0, 2] - m[..., 2, 0])
    z = jnp.copysign(z, m[..., 1, 0] - m[..., 0, 1])
    return normalize(jnp.stack([w, x, y, z], axis=-1))


def direction(phi, theta):
    """Spherical angles -> unit direction (Euler.cpp:144-156)."""
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1)


def align_z(v, eps=1e-12):
    """Rotation matrix mapping unit vector ``v`` to the +z axis
    (Euler.cpp:240-269): row 2 is v; rows 0/1 complete the frame."""
    v = jnp.asarray(v)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    p_yz = jnp.sqrt(y * y + z * z)
    p = jnp.linalg.norm(v, axis=-1)
    safe = p_yz / jnp.maximum(p, eps) > 1e-6
    pyz = jnp.maximum(p_yz, eps)
    m_gen = jnp.stack(
        [
            p_yz, -x * y / pyz, -x * z / pyz,
            jnp.zeros_like(x), z / pyz, -y / pyz,
            x / jnp.maximum(p, eps), y / jnp.maximum(p, eps), z / jnp.maximum(p, eps),
        ],
        axis=-1,
    ).reshape(v.shape[:-1] + (3, 3))
    # degenerate branch: v along +-x
    m_deg = jnp.broadcast_to(
        jnp.asarray([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], dtype=v.dtype),
        m_gen.shape,
    )
    return jnp.where(safe[..., None, None], m_gen, m_deg)


def reflect3d(plane):
    """Householder-style reflection about the plane with normal ``plane``
    (Euler.cpp:284-295): A^T diag(1,1,-1) A with A = align_z(plane)."""
    a = align_z(plane)
    m = jnp.asarray([1.0, 1.0, -1.0], dtype=a.dtype)
    return jnp.einsum("...ji,j,...jk->...ik", a, m, a)


def swing_twist(q, axis):
    """Decompose q = swing * twist where twist rotates about ``axis``
    (Euler.cpp:294-305). Returns (swing, twist)."""
    p = jnp.sum(q[..., 1:4] * axis, axis=-1, keepdims=True)
    twist = jnp.concatenate([q[..., 0:1], p * axis], axis=-1)
    twist = normalize(twist)
    swing = quat_mul(q, quat_conj(twist))
    return swing, twist


def random_quat(key, n):
    """Uniform random rotations as quaternions: normalized 4D Gaussians."""
    q = jax.random.normal(key, (n, 4))
    return normalize(q)


def sample_unit_sphere_2d(key, n):
    v = jax.random.normal(key, (n, 2))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)
