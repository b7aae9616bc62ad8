import numpy as np
import jax.numpy as jnp

from thunder_tpu.geom.symmetry import Symmetry, symmetry_counterpart
from thunder_tpu.geom import quat


def test_group_orders():
    # nSymmetryElement() = |G| - 1 convention
    assert Symmetry("C1").n_elements == 0
    assert Symmetry("C2").n_elements == 1
    assert Symmetry("C4").n_elements == 3
    assert Symmetry("D2").n_elements == 3
    assert Symmetry("D7").n_elements == 13
    assert Symmetry("T").n_elements == 11
    assert Symmetry("O").n_elements == 23
    for sym in ("I1", "I2", "I3", "I4"):
        assert Symmetry(sym).n_elements == 59, sym


def test_group_closure():
    sym = Symmetry("D3")
    mats = sym.rot_with_identity()
    # closure: product of any two elements is in the group
    for a in mats:
        for b in mats:
            c = a @ b
            assert min(np.max(np.abs(c - m)) for m in mats) < 1e-3


def test_c4_is_z_rotations():
    sym = Symmetry("C4")
    z = np.array([0.0, 0, 1])
    for m in sym.rot:
        np.testing.assert_allclose(m @ z, z, atol=1e-10)


def test_symmetry_counterpart_identity_for_c1():
    q = quat.normalize(jnp.array([[0.1, 0.4, -0.2, 0.5]]))
    out = symmetry_counterpart(q, np.zeros((0, 4)))
    np.testing.assert_allclose(out, q)


def test_symmetry_counterpart_moves_toward_anchor():
    sym = Symmetry("C4")
    # rotation by 170 deg about z; counterpart should be within +-45 deg
    q = quat.quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.deg2rad(170.0))
    out = symmetry_counterpart(q[None], sym.quat)
    # |w| = cos(angle/2) should now be large (angle <= 45 deg)
    assert abs(float(out[0, 0])) > np.cos(np.deg2rad(45.01) / 2)


def test_symmetry_counterpart_batched_rank3():
    """|G| > 1 with rank-3 batched quaternions (the phase-B perturb path
    under C4) must broadcast; every result must be q or conj(g) q."""
    import jax
    import jax.numpy as jnp
    from thunder_tpu.geom import quat as quat_ops
    from thunder_tpu.geom.symmetry import Symmetry, symmetry_counterpart

    sym = Symmetry("C4")
    q = quat_ops.random_quat(jax.random.PRNGKey(0), 6 * 5).reshape(6, 5, 4)
    out = symmetry_counterpart(q, jnp.asarray(sym.quat))
    assert out.shape == (6, 5, 4)
    # each output is one of the candidates
    g = jnp.concatenate([jnp.asarray([[1.0, 0, 0, 0]]),
                         jnp.asarray(sym.quat)], 0)
    cand = quat_ops.quat_mul(
        quat_ops.quat_conj(g)[:, None, None, :], q[None])
    match = jnp.min(jnp.sum((cand - out[None]) ** 2, -1), axis=0)
    assert float(jnp.max(match)) < 1e-10
    # and scores at least as high as the raw quaternion's
    anchor = jnp.asarray([1.0, 0, 0, 0])
    s_out = jnp.abs(jnp.sum(out * anchor, -1))
    s_in = jnp.abs(jnp.sum(q * anchor, -1))
    assert float(jnp.min(s_out - s_in)) >= -1e-6
