import numpy as np
import jax.numpy as jnp

from thunder_tpu.geom import quat


def test_quat_mul_identity():
    e = jnp.array([1.0, 0, 0, 0])
    q = quat.normalize(jnp.array([0.3, 0.5, -0.2, 0.7]))
    np.testing.assert_allclose(quat.quat_mul(e, q), q, atol=1e-6)
    np.testing.assert_allclose(quat.quat_mul(q, quat.quat_conj(q)), e, atol=1e-6)


def test_rotate3d_orthonormal(rng):
    q = quat.normalize(jnp.asarray(rng.normal(size=(10, 4)), dtype=jnp.float32))
    r = quat.rotate3d(q)
    eye = jnp.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-5)


def test_rotate3d_matches_axis_angle():
    # 90 degrees about z
    q = quat.quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.pi / 2)
    r = quat.rotate3d(q)
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(r, expect, atol=1e-6)


def test_quat_matrix_roundtrip(rng):
    q = quat.normalize(jnp.asarray(rng.normal(size=(20, 4)), dtype=jnp.float32))
    # sign convention: w >= 0
    q = jnp.where(q[:, :1] < 0, -q, q)
    r = quat.rotate3d(q)
    q2 = quat.quat_from_matrix(r)
    np.testing.assert_allclose(q2, q, atol=1e-4)


def test_euler_roundtrip():
    phi, theta, psi = 0.7, 1.1, 2.3
    q = quat.quat_from_euler(phi, theta, psi)
    r1 = quat.rotate3d(q)
    p2, t2, s2 = quat.euler_from_quat(q)
    r2 = quat.rotate3d(quat.quat_from_euler(p2, t2, s2))
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_rotate2d():
    r = quat.rotate2d(jnp.pi / 2)
    np.testing.assert_allclose(r, [[0, -1], [1, 0]], atol=1e-6)


def test_swing_twist(rng):
    q = quat.normalize(jnp.asarray(rng.normal(size=(4,)), dtype=jnp.float32))
    axis = jnp.array([0.0, 0, 1])
    swing, twist = quat.swing_twist(q, axis)
    # twist axis is z: x, y components vanish
    np.testing.assert_allclose(twist[1:3], 0.0, atol=1e-6)
    # recomposition: q = swing * twist
    np.testing.assert_allclose(quat.quat_mul(swing, twist), q, atol=1e-5)


def test_align_z():
    v = quat.normalize(jnp.array([0.3, -0.4, 0.85]))
    m = quat.align_z(v)
    np.testing.assert_allclose(m @ v, jnp.array([0, 0, 1.0]), atol=1e-5)
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
