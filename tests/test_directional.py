import jax
import numpy as np
import jax.numpy as jnp

from thunder_tpu.geom import directional as ds


def test_sample_acg_unit_norm():
    key = jax.random.PRNGKey(0)
    q = ds.sample_acg_k0k1(key, 1.0, 0.1, 500)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


def test_infer_acg_roundtrip():
    # sample from anisotropic ACG and recover the concentration ratio
    key = jax.random.PRNGKey(1)
    k_true = 0.04
    q = ds.sample_acg_k0k1(key, 1.0, k_true, 4000)
    k0, k1 = ds.infer_acg_k0k1(q)
    ratio = float(k1 / k0)
    assert 0.5 * k_true < ratio < 2.0 * k_true, ratio


def test_infer_acg_isotropic():
    key = jax.random.PRNGKey(2)
    q = ds.sample_acg_k0k1(key, 1.0, 1.0, 4000)
    k0, k1 = ds.infer_acg_k0k1(q)
    assert 0.7 < float(k1 / k0) <= 1.01


def test_infer_acg_mean():
    key = jax.random.PRNGKey(3)
    # tight cluster around identity quaternion
    q = ds.sample_acg_k0k1(key, 1.0, 1e-4, 1000)
    mean = ds.infer_acg_mean(q)
    # mean should be +-e0
    assert abs(float(jnp.abs(mean[0]))) > 0.99


def test_bessel_i0_against_scipy_table():
    # reference values of I0 at sample points (scipy.special.i0)
    xs = np.array([0.0, 0.5, 1.0, 2.0, 3.75, 5.0, 10.0])
    expect = np.array(
        [1.0, 1.0634833707413236, 1.2660658777520084, 2.2795853023360673,
         9.118940222504177, 27.239871823604442, 2815.716628466254]
    )
    got = np.asarray(ds._bessel_i0(jnp.asarray(xs, dtype=jnp.float32)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_sample_vms_concentration():
    key = jax.random.PRNGKey(4)
    mu = jnp.array([1.0, 0.0])
    x = ds.sample_vms(key, mu, 0.05, 2000)
    np.testing.assert_allclose(np.linalg.norm(x, axis=-1), 1.0, atol=1e-5)
    # concentrated near mu
    assert float(jnp.mean(x[:, 0])) > 0.8


def test_sample_vms_uniform_limit():
    key = jax.random.PRNGKey(5)
    mu = jnp.array([1.0, 0.0])
    x = ds.sample_vms(key, mu, 1.0, 4000)  # k=1 -> kappa ~ 0 -> uniform
    m = np.asarray(jnp.mean(x, axis=0))
    assert np.linalg.norm(m) < 0.1


def test_infer_vms_roundtrip():
    key = jax.random.PRNGKey(6)
    mu = jnp.array([np.cos(0.6), np.sin(0.6)], dtype=jnp.float32)
    x = ds.sample_vms(key, mu, 0.1, 4000)
    mu_est, k_est = ds.infer_vms(x)
    np.testing.assert_allclose(mu_est, mu, atol=0.05)
    assert 0.03 < float(k_est) < 0.3
