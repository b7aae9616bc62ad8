import jax
import numpy as np
import jax.numpy as jnp

from thunder_tpu.ops import likelihood


def _setup(rng, b=6, k=2, r=7, t=5, p=64):
    dat = jnp.asarray(
        (rng.normal(size=(b, p)) + 1j * rng.normal(size=(b, p))).astype(np.complex64)
    )
    ctf = jnp.asarray(rng.uniform(-1, 1, size=(b, p)).astype(np.float32))
    sig = jnp.asarray(rng.uniform(0.5, 2.0, size=(b, p)).astype(np.float32))
    sig_rcp = -0.5 / sig
    proj = jnp.asarray(
        (rng.normal(size=(k, r, p)) + 1j * rng.normal(size=(k, r, p))).astype(
            np.complex64
        )
    )
    phase = rng.uniform(0, 2 * np.pi, size=(t, p))
    tra = jnp.asarray(np.exp(-1j * phase).astype(np.complex64))
    return dat, ctf, sig_rcp, proj, tra


def _brute_force(dat, ctf, sig_rcp, proj, tra):
    """Explicit logL[b,k,r,t] via the unfactored formula."""
    pri = np.asarray(proj)[:, :, None, :] * np.asarray(tra)[None, None, :, :]  # (K,R,T,P)
    d = np.asarray(dat)[:, None, None, None, :]
    c = np.asarray(ctf)[:, None, None, None, :]
    s = np.asarray(sig_rcp)[:, None, None, None, :]
    resid = d - c * np.asarray(pri)[None]
    return np.sum((np.abs(resid) ** 2) * s, axis=-1)  # (B,K,R,T)


def test_factored_matches_brute_force(rng):
    dat, ctf, sig_rcp, proj, tra = _setup(rng)
    out = likelihood.global_search_weights(dat, ctf, sig_rcp, proj, tra)
    log_l = _brute_force(dat, ctf, sig_rcp, proj, tra)
    b = log_l.shape[0]
    # brute-force posteriors with uniform priors
    w = np.exp(log_l - log_l.max(axis=(1, 2, 3), keepdims=True))
    r, t = log_l.shape[2], log_l.shape[3]
    wc = w.sum(axis=(2, 3)) / (r * t)
    wr = w.sum(axis=3) / t
    wt = w.sum(axis=2) / r

    def norm(x):
        return x / x.reshape(b, -1).sum(axis=1).reshape((b,) + (1,) * (x.ndim - 1))

    np.testing.assert_allclose(norm(np.asarray(out["wC"])), norm(wc), rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(norm(np.asarray(out["wR"])), norm(wr), rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(norm(np.asarray(out["wT"])), norm(wt), rtol=2e-3, atol=1e-5)


def test_direct_loglik_matches_formula(rng):
    b, s, p = 3, 4, 32
    dat = jnp.asarray((rng.normal(size=(b, p)) + 1j * rng.normal(size=(b, p))).astype(np.complex64))
    ctf = jnp.asarray(rng.uniform(-1, 1, size=(b, p)).astype(np.float32))
    sig_rcp = jnp.asarray((-0.5 / rng.uniform(0.5, 2, size=(b, p))).astype(np.float32))
    pri = jnp.asarray((rng.normal(size=(b, s, p)) + 1j * rng.normal(size=(b, s, p))).astype(np.complex64))
    out = likelihood.log_likelihood_pose(dat, ctf, sig_rcp, pri)
    expect = np.sum(
        np.abs(np.asarray(dat)[:, None] - np.asarray(ctf)[:, None] * np.asarray(pri)) ** 2
        * np.asarray(sig_rcp)[:, None],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4)


def test_best_pose_is_true_pose(rng):
    """Generate data from a known (rotation, translation); the posterior
    must peak there."""
    dat, ctf, sig_rcp, proj, tra = _setup(rng, b=1, k=1, r=9, t=6, p=128)
    true_r, true_t = 4, 2
    clean = ctf[0] * tra[true_t] * proj[0, true_r]
    dat = clean[None] + 0.01 * jnp.asarray(
        (rng.normal(size=(1, 128)) + 1j * rng.normal(size=(1, 128))).astype(np.complex64)
    )
    out = likelihood.global_search_weights(dat, ctf, sig_rcp, proj, tra)
    assert int(jnp.argmax(out["wR"][0, 0])) == true_r
    assert int(jnp.argmax(out["wT"][0, 0])) == true_t


def test_pixel_mask_zeroes_padding(rng):
    dat, ctf, sig_rcp, proj, tra = _setup(rng, b=2, k=1, r=3, t=2, p=32)
    mask = jnp.asarray(([1.0] * 20 + [0.0] * 12), dtype=jnp.float32)
    out_m = likelihood.global_search_weights(dat, ctf, sig_rcp, proj, tra, pixel_mask=mask)
    # same as truncating the pixel set
    out_c = likelihood.global_search_weights(
        dat[:, :20], ctf[:, :20], sig_rcp[:, :20], proj[:, :, :20], tra[:, :20]
    )
    np.testing.assert_allclose(
        np.asarray(out_m["wR"]), np.asarray(out_c["wR"]), rtol=1e-3, atol=1e-6
    )
