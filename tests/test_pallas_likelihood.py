"""The fused Pallas global-scan likelihood must reproduce the XLA factored
path (ops/likelihood.py global_search_weights) up to bf16 input rounding:
identical argmax poses and matching posterior marginals after
normalisation. Runs in interpret mode on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thunder_tpu.ops import likelihood

# heavy e2e fixtures: deselect with -m 'not slow' for the fast unit path
pytestmark = pytest.mark.slow


def _problem(rng, b=8, p=512, k=1, r=160, t=5, scale=1.0):
    dat = (rng.normal(size=(b, p)) + 1j * rng.normal(size=(b, p))).astype(
        np.complex64)
    ctf = rng.uniform(-1, 1, size=(b, p)).astype(np.float32)
    sig_rcp = (-0.5 / rng.uniform(0.5, 2, size=(b, p))).astype(np.float32)
    # projections correlated with the data so log-likelihoods spread
    proj = (dat[None, :r % b or 1] if False else
            (rng.normal(size=(k, r, p)) + 1j * rng.normal(size=(k, r, p))))
    proj = (proj * scale).astype(np.complex64)
    # make pose 3 of image 0 a near-match so the argmax is meaningful
    proj[0, 3] = dat[0] / ctf[0]
    phase = rng.uniform(0, 2 * np.pi, size=(t, p))
    tra = np.exp(1j * phase).astype(np.complex64)
    pm = (rng.uniform(size=p) > 0.1).astype(np.float32)
    return (jnp.asarray(dat), jnp.asarray(ctf), jnp.asarray(sig_rcp),
            jnp.asarray(proj), jnp.asarray(tra), jnp.asarray(pm))


@pytest.mark.parametrize("k,r", [(1, 160), (2, 96), (3, 128)])
def test_fused_matches_reference(rng, k, r):
    dat, ctf, sig_rcp, proj, tra, pm = _problem(rng, k=k, r=r, scale=0.05)
    ref = likelihood.global_search_weights(
        dat, ctf, sig_rcp, proj, tra, pixel_mask=pm)
    got = likelihood.global_search_weights_fused(
        dat, ctf, sig_rcp, proj, tra, pixel_mask=pm, interpret=True)

    for name in ("wC", "wR", "wT"):
        a = np.asarray(ref[name], np.float64)
        g = np.asarray(got[name], np.float64)
        # compare normalised posteriors (the raw scale depends on the
        # baseline, which is identical up to bf16 rounding of logL)
        a = a / np.maximum(a.sum(axis=tuple(range(1, a.ndim)),
                                 keepdims=True), 1e-300)
        g = g / np.maximum(g.sum(axis=tuple(range(1, g.ndim)),
                                 keepdims=True), 1e-300)
        assert np.abs(a - g).max() < 5e-2, (name, np.abs(a - g).max())
    # the dominant pose must agree exactly
    assert np.argmax(np.asarray(ref["wR"])[0]) == np.argmax(
        np.asarray(got["wR"])[0])


def test_fused_priors_and_padding(rng):
    """Non-uniform priors + shapes that do not divide the tile sizes."""
    b, p, k, r, t = 5, 256, 2, 70, 3
    dat, ctf, sig_rcp, proj, tra, pm = _problem(
        rng, b=b, p=p, k=k, r=r, t=t, scale=0.02)
    pr = jnp.asarray(rng.dirichlet(np.ones(r), size=b).astype(np.float32))
    pt = jnp.asarray(rng.dirichlet(np.ones(t), size=b).astype(np.float32))
    ref = likelihood.global_search_weights(
        dat, ctf, sig_rcp, proj, tra, prior_r=pr, prior_t=pt, pixel_mask=pm)
    got = likelihood.global_search_weights_fused(
        dat, ctf, sig_rcp, proj, tra, prior_r=pr, prior_t=pt, pixel_mask=pm,
        interpret=True)
    for name in ("wC", "wR", "wT"):
        a = np.asarray(ref[name], np.float64)
        g = np.asarray(got[name], np.float64)
        a = a / np.maximum(a.sum(axis=tuple(range(1, a.ndim)),
                                 keepdims=True), 1e-300)
        g = g / np.maximum(g.sum(axis=tuple(range(1, g.ndim)),
                                 keepdims=True), 1e-300)
        assert np.abs(a - g).max() < 5e-2, (name, np.abs(a - g).max())
    # pad poses must carry zero weight
    assert np.asarray(got["wR"]).shape == (b, k, r)


def test_fused_scan_on_mesh():
    """scan_init with the fused kernel (interpret mode) inside shard_map on
    the 8-device mesh: the seeded filter must agree with the XLA path on
    the dominant poses (bf16 rounding may flip near-ties)."""
    from test_engine import _dataset, _build
    from thunder_tpu.parallel.mesh import make_mesh

    vol, imgs, cp = _dataset()
    oa = _build(make_mesh(n_devices=8), vol, imgs, cp)
    ob = _build(make_mesh(n_devices=8), vol, imgs, cp)
    ob.para.fused_kernels = "interpret"
    oa.global_scan()
    ob.global_scan()
    qa = oa._from_plane(oa.par["topR"])
    qb = ob._from_plane(ob.par["topR"])
    align = np.abs(np.sum(qa * qb, axis=-1))
    assert np.mean(align > 0.9) >= 0.8, align
