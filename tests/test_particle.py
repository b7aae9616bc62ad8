import jax
import numpy as np
import jax.numpy as jnp

from thunder_tpu.core import particle
from thunder_tpu.geom import quat


def test_systematic_resample_concentrates():
    keys = particle.split_keys(jax.random.PRNGKey(0), 2)
    w = jnp.asarray([[0.0, 0.0, 1.0, 0.0], [0.25, 0.25, 0.25, 0.25]])
    pts = jnp.arange(4.0).reshape(1, 4, 1).repeat(2, axis=0)
    out = particle._systematic_resample(keys, w, pts, 8)
    # first batch: all mass at point 2
    np.testing.assert_allclose(out[0, :, 0], 2.0)
    # second batch: all points represented
    assert len(np.unique(np.asarray(out[1, :, 0]))) == 4


def test_keep_half_height_peak():
    u = jnp.asarray([[1.0, 0.6, 0.4, 0.1]])
    out = particle.keep_half_height_peak(u, 0.5)
    np.testing.assert_allclose(out, [[0.5, 0.1, 0.0, 0.0]], atol=1e-6)


def test_cal_peak_factor_adaptive():
    """Particle::setPeakFactor (Particle.cpp:1890-1955): ratio of the q-th
    largest likelihood to the largest, clamped."""
    u = jnp.asarray([[1.0, 0.8, 0.3, 0.1], [1.0, 1e-6, 1e-7, 1e-8]])
    pf = np.asarray(particle.cal_peak_factor(u, 1))
    assert pf[0] == np.float32(0.5)  # 0.8 clamps to PEAK_FACTOR_MAX
    assert pf[1] == np.float32(particle.PEAK_FACTOR_MIN)


def test_cal_vari_r_tight_cluster():
    key = jax.random.PRNGKey(1)
    b, n_r = 3, 64
    base = quat.random_quat(key, b)
    # tiny perturbations around each base
    eps = 0.01 * jax.random.normal(jax.random.PRNGKey(2), (b, n_r, 4))
    r = quat.normalize(base[:, None, :] + eps)
    k1, k2, k3, _ = particle.cal_vari_r(r)
    assert np.all(np.asarray(k1) < 0.01)
    mean = particle._acg_mean(r)
    dots = np.abs(np.sum(np.asarray(mean) * np.asarray(base), axis=-1))
    assert np.all(dots > 0.999)


def test_perturb_scale():
    b, n_r = 2, 128
    keys = particle.split_keys(jax.random.PRNGKey(3), b)
    r = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (b, n_r, 1))
    small = particle.perturb_r(keys, r, *(jnp.full((b,), 1e-4),) * 3, 1.0)
    large = particle.perturb_r(keys, r, *(jnp.full((b,), 1e-1),) * 3, 1.0)
    ang_small = 2 * np.degrees(np.arccos(np.clip(np.abs(np.asarray(small[..., 0])), -1, 1)))
    ang_large = 2 * np.degrees(np.arccos(np.clip(np.abs(np.asarray(large[..., 0])), -1, 1)))
    # ACG tangent perturbations are ratio-distributed (heavy tailed):
    # compare medians
    assert np.median(ang_small) < np.median(ang_large)
    assert np.median(ang_small) < 5.0


def test_perturb_r_2d_scale():
    """2D support vectors (cos, sin) perturbed by VMS increments."""
    b, n_r = 2, 256
    keys = particle.split_keys(jax.random.PRNGKey(13), b)
    r = jnp.zeros((b, n_r, 4)).at[..., 0].set(1.0)  # angle 0
    small = particle.perturb_r_2d(keys, r, jnp.full((b,), 1e-4), 1.0)
    large = particle.perturb_r_2d(keys, r, jnp.full((b,), 0.9), 1.0)
    ang_s = np.abs(np.arctan2(np.asarray(small[..., 1]), np.asarray(small[..., 0])))
    ang_l = np.abs(np.arctan2(np.asarray(large[..., 1]), np.asarray(large[..., 0])))
    assert np.median(ang_s) < np.median(ang_l)
    # unit norm preserved
    np.testing.assert_allclose(
        np.asarray(small[..., 0] ** 2 + small[..., 1] ** 2), 1.0, atol=1e-5)


def test_filter_converges_to_target():
    """Toy: likelihood = -angle(q, target)^2 / s - |t - t*|^2; iterate
    perturb -> evaluate -> update; topR/topT must converge."""
    b, n_r, n_t = 4, 32, 9
    target_q = quat.random_quat(jax.random.PRNGKey(5), b)
    target_t = jnp.asarray(np.random.default_rng(6).uniform(-3, 3, (b, 2)).astype(np.float32))

    state = particle.make_state(b, n_r, n_t)
    # start with a broad cloud
    state["r"] = quat.random_quat(jax.random.PRNGKey(7), b * n_r).reshape(b, n_r, 4)
    state["t"] = jnp.asarray(
        np.random.default_rng(8).uniform(-5, 5, (b, n_t, 2)).astype(np.float32)
    )
    state["k1"] = state["k2"] = state["k3"] = jnp.full((b,), 0.5)
    state["s0"] = state["s1"] = jnp.full((b,), 2.0)

    base = jax.random.PRNGKey(4)
    for i in range(25):
        ki = jax.random.fold_in(base, i)
        kp = particle.split_keys(jax.random.fold_in(ki, 0), b)
        kt2 = particle.split_keys(jax.random.fold_in(ki, 1), b)
        ku = particle.split_keys(jax.random.fold_in(ki, 2), b, 4)
        state["r"] = particle.perturb_r(kp, state["r"], state["k1"],
                                        state["k2"], state["k3"], 0.5)
        state["t"] = particle.perturb_t(kt2, state["t"], state["s0"],
                                        state["s1"], 0.5)
        dot = jnp.abs(jnp.sum(state["r"] * target_q[:, None, :], axis=-1))
        ang = 2 * jnp.arccos(jnp.clip(dot, -1, 1))
        u_r = jnp.exp(-(ang**2) * 40)
        dt = jnp.sum((state["t"] - target_t[:, None, :]) ** 2, axis=-1)
        u_t = jnp.exp(-dt * 2)
        state = particle.update_from_likelihood(state, ku, u_r, u_t)

    dots = np.abs(np.sum(np.asarray(state["topR"]) * np.asarray(target_q), axis=-1))
    ang_deg = 2 * np.degrees(np.arccos(np.clip(dots, -1, 1)))
    assert np.median(ang_deg) < 5.0, ang_deg
    terr = np.linalg.norm(np.asarray(state["topT"]) - np.asarray(target_t), axis=-1)
    assert np.median(terr) < 0.5, terr
    # variance should have collapsed
    assert float(jnp.mean(state["k1"])) < 0.05


def test_init_from_scan():
    b, n_scan_r, n_scan_t = 3, 100, 20
    keys = particle.split_keys(jax.random.PRNGKey(9), b, 3)
    scan_q = quat.random_quat(jax.random.PRNGKey(10), n_scan_r)
    scan_t = jnp.asarray(np.random.default_rng(11).normal(0, 2, (n_scan_t, 2)).astype(np.float32))
    # posterior peaked at index 7 (rot), 3 (trans); one class
    w_c = jnp.ones((b, 1))
    w_r = jnp.full((b, 1, n_scan_r), 1e-6).at[:, 0, 7].set(1.0)
    w_t = jnp.full((b, 1, n_scan_t), 1e-6).at[:, 0, 3].set(1.0)
    st = particle.init_from_scan(keys, w_c, w_r, w_t, scan_q, scan_t, 16, 8)
    dots = np.abs(np.sum(np.asarray(st["topR"]) * np.asarray(scan_q[7]), axis=-1))
    assert np.all(dots > 0.999)
    np.testing.assert_allclose(
        np.asarray(st["topT"]), np.tile(np.asarray(scan_t[3]), (b, 1)), atol=1e-5
    )
    assert st["r"].shape == (b, 16, 4)
    assert np.all(np.asarray(st["c"]) == 0)


def test_init_from_scan_draws_class():
    """Class is DRAWN from the clipped posterior, not argmaxed
    (src/Optimiser.cpp:955-960)."""
    b, n_r, n_t, k = 64, 10, 10, 2
    keys = particle.split_keys(jax.random.PRNGKey(21), b, 3)
    w_c = jnp.tile(jnp.asarray([[0.5, 0.5]]), (b, 1))
    w_r = jnp.ones((b, k, n_r))
    w_t = jnp.ones((b, k, n_t))
    scan_q = quat.random_quat(jax.random.PRNGKey(22), n_r)
    scan_t = jnp.zeros((n_t, 2))
    st = particle.init_from_scan(keys, w_c, w_r, w_t, scan_q, scan_t, 8, 4)
    cls = np.asarray(st["c"])
    assert 0.2 < cls.mean() < 0.8  # both classes drawn


def test_symmetrise_r_anchors_to_fundamental_domain():
    """Posterior symmetrise (Particle.cpp:2445): C2-equivalent support
    points collapse to the counterpart nearest the anchor."""
    from thunder_tpu.geom.symmetry import Symmetry

    sym = Symmetry("C2")
    sq = jnp.asarray(sym.quat.astype(np.float32))
    anchor = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    base = quat.normalize(jnp.asarray([[0.99, 0.05, 0.08, 0.02]]))
    # the C2 counterpart of base (rotate by g around z)
    other = quat.quat_mul(quat.quat_conj(sq[0])[None], base)
    r = jnp.stack([base[0], other[0]])[None]  # (1, 2, 4)
    out = particle.symmetrise_r(r, sq, anchor)
    dots = np.abs(np.sum(np.asarray(out[0]) * np.asarray(out[0][0:1]), axis=-1))
    assert np.all(dots > 0.999)  # both mapped to the same counterpart
