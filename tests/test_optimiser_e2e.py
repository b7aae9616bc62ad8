"""End-to-end slice: synthetic 3D refinement must recover pose assignments
and improve the golden-standard FSC resolution over iterations."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from thunder_tpu.config import Para
from thunder_tpu.geom import quat
from thunder_tpu.ops import fft, pixels, spectrum
from thunder_tpu.ops.translate import translate_ft
from thunder_tpu.core import projector
from thunder_tpu.core.optimiser import Optimiser, SEARCH_TYPE_GLOBAL

# heavy e2e fixtures: deselect with -m 'not slow' for the fast unit path
pytestmark = pytest.mark.slow


def _phantom(n):
    g = np.mgrid[:n, :n, :n] - n // 2
    blob = lambda c, s: np.exp(
        -((g[0] - c[0]) ** 2 + (g[1] - c[1]) ** 2 + (g[2] - c[2]) ** 2) / (2 * s**2)
    )
    v = (
        blob((0, 4, 2), 2.5)
        + 0.8 * blob((3, -4, -2), 2.0)
        + 0.6 * blob((-5, 0, 4), 1.8)
        + 0.9 * blob((1, 1, -5), 1.6)
    )
    return v.astype(np.float32)


def _make_dataset(n=32, n_imgs=96, noise=0.1, trans_s=1.5, seed=0):
    """Project a phantom at known poses with CTF and noise."""
    rng = np.random.default_rng(seed)
    vol = jnp.asarray(_phantom(n))
    vf = projector.build_projectee_3d(vol, pf=2)
    quats = np.asarray(quat.random_quat(jax.random.PRNGKey(seed + 1), n_imgs))
    rots = quat.rotate3d(jnp.asarray(quats))
    trans = rng.normal(0, trans_s, size=(n_imgs, 2)).astype(np.float32)

    ctf_params = {
        "voltage": np.full(n_imgs, 300000.0, np.float32),
        "defocus_u": rng.uniform(12000, 25000, n_imgs).astype(np.float32),
        "defocus_v": rng.uniform(12000, 25000, n_imgs).astype(np.float32),
        "defocus_theta": rng.uniform(0, np.pi, n_imgs).astype(np.float32),
        "cs": np.full(n_imgs, 2.7e7, np.float32),
        "amp_contrast": np.full(n_imgs, 0.1, np.float32),
        "phase_shift": np.zeros(n_imgs, np.float32),
    }

    # full-grid projection -> ctf -> translate -> ifft + noise
    imgs = []
    from thunder_tpu.ops import ctf as ctf_ops

    col, row = fft.freq_grid_2d(n)
    c_grid = ctf_ops.ctf_pixels(
        col, row, n, 1.32,
        jnp.asarray(ctf_params["voltage"]), jnp.asarray(ctf_params["defocus_u"]),
        jnp.asarray(ctf_params["defocus_v"]), jnp.asarray(ctf_params["defocus_theta"]),
        jnp.asarray(ctf_params["cs"]), jnp.asarray(ctf_params["amp_contrast"]),
        jnp.asarray(ctf_params["phase_shift"]),
    )
    slices = projector.project_full_3d(vf, rots, n, n // 2 - 1, pf=2)  # (B, n, n)
    ft = slices * c_grid
    ft = translate_ft(ft, jnp.asarray(trans[:, 0]), jnp.asarray(trans[:, 1]))
    imgs = np.asarray(fft.ifft2_center(ft).real)
    imgs = imgs + rng.normal(0, noise * imgs.std(), imgs.shape).astype(np.float32)
    return vol, imgs.astype(np.float32), quats, trans, ctf_params


@pytest.fixture(scope="module")
def refined():
    n = 32
    vol, imgs, quats, trans, ctf_params = _make_dataset(n=n)
    # init at shell ~6, global search to shell ~12 (n=32 box)
    para = Para(
        mode="3d", k=1, size=n, pixel_size=1.32,
        mask_radius=n * 1.32 / 2.2, trans_s=2.0,
        init_res=6.5, global_search_res=3.4, sym="C1",
        m_s=800, m_l_r=64, m_l_t=9, m_reco=8,
        trans_search_factor=0.25, l_search=True,
        pf=2, seed=5,
    )
    opt = Optimiser(para)
    opt.set_data(imgs, ctf_params)
    # like the reference demo, start from an initial model (it is low-passed
    # to the initial resolution inside init_reference)
    opt.init_reference(vol=vol)
    opt.init_sigma()
    history = opt.run(max_iter=3)
    return vol, opt, history, quats


def test_resolution_improves(refined):
    vol, opt, history, _ = refined
    assert len(history) >= 2
    # with the particle filter the pose precision beats the scan grid and
    # the golden-standard resolution reaches shell 7+ on this dataset
    assert all(h["res_shell"] >= 6 for h in history), history
    assert max(h["res_shell"] for h in history) >= 7, history


def test_map_correlates_with_phantom(refined):
    vol, opt, history, _ = refined
    rec = np.asarray(opt.refs[0, 0])
    a = np.asarray(fft.fft3_center(jnp.asarray(rec)))
    b = np.asarray(fft.fft3_center(vol))
    n = vol.shape[0]
    fsc = np.asarray(spectrum.frc_fsc(jnp.asarray(a), jnp.asarray(b), n // 2, 3))
    # high fidelity at low-mid frequency vs ground truth
    assert np.all(fsc[1:8] > 0.6), fsc


def test_rotations_recovered(refined):
    """Estimated rotations should be close to the true poses (up to the
    scan grid spacing)."""
    _, opt, _, quats_true = refined
    q_est = opt.best_quat
    # angular error between quaternions: theta = 2 arccos(|<q1, q2>|)
    dots = np.abs(np.sum(q_est * quats_true, axis=1))
    ang = 2 * np.degrees(np.arccos(np.clip(dots, -1, 1)))
    # the local particle filter refines well below the ~20 deg scan grid
    assert np.median(ang) < 15.0, np.percentile(ang, [25, 50, 75, 90])
