import jax
import numpy as np
import jax.numpy as jnp

from thunder_tpu.ops import fft, ctf, spectrum, filters, kernels, translate, pixels, mask


def test_fft_center_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32))
    ft = fft.fft2_center(x)
    back = fft.ifft2_center(ft)
    np.testing.assert_allclose(back.real, x, atol=1e-4)


def test_fft_center_dc_position(rng):
    x = jnp.ones((8, 8))
    ft = fft.fft2_center(x)
    # DC at [n/2, n/2]
    assert abs(ft[4, 4] - 64.0) < 1e-4
    assert jnp.sum(jnp.abs(ft)) - jnp.abs(ft[4, 4]) < 1e-3


def test_fft_delta_at_center_is_flat():
    # object at real-space center N/2 -> constant spectrum (no phase ramp)
    x = jnp.zeros((8, 8)).at[4, 4].set(1.0)
    ft = fft.fft2_center(x)
    np.testing.assert_allclose(ft.real, 1.0, atol=1e-5)
    np.testing.assert_allclose(ft.imag, 0.0, atol=1e-5)


def test_translate_shifts_image(rng):
    n = 16
    img = jnp.zeros((n, n)).at[8, 8].set(1.0)
    ft = fft.fft2_center(img)
    ft_t = translate.translate_ft(ft, 3.0, 2.0)
    back = fft.ifft2_center(ft_t).real
    # peak moved to (8 + 2, 8 + 3) [row=y, col=x]
    assert np.unravel_index(np.argmax(np.asarray(back)), back.shape) == (10, 11)


def test_ctf_matches_reference_formula():
    # CTF(f) at f = 1/(4 A), 300 kV, 20000 A defocus, Cs 2.7e7 A
    voltage, defocus, cs = 300000.0, 20000.0, 2.7e7
    lam = 12.2643247 / np.sqrt(voltage * (1 + voltage * 0.978466e-6))
    f = 0.25
    chi = np.pi * lam * defocus * f**2 + np.pi / 2 * cs * lam**3 * f**4
    expect = -np.sqrt(1 - 0.01) * np.sin(chi) + 0.1 * np.cos(chi)
    got = ctf.ctf_1d(f, voltage, defocus, cs, 0.1)
    # chi is tens of radians; f32 sin costs ~1e-5 absolute, acceptable vs
    # the noise floor the CTF multiplies into
    np.testing.assert_allclose(float(got), expect, atol=2e-4)


def test_ctf_pixels_astigmatism_batched():
    n = 32
    col, row = fft.freq_grid_2d(n)
    out = ctf.ctf_pixels(
        col, row, n, 1.32,
        voltage=jnp.array([300000.0, 200000.0]),
        defocus_u=jnp.array([15000.0, 20000.0]),
        defocus_v=jnp.array([14000.0, 21000.0]),
        defocus_theta=jnp.array([0.3, 0.0]),
        cs=jnp.array([2.7e7, 2.7e7]),
        amp_contrast=jnp.array([0.1, 0.1]),
        phase_shift=jnp.array([0.0, 0.0]),
    )
    assert out.shape == (2, n, n)
    # astigmatism: 90-degree rotated frequency gives defocus_v response
    assert not np.allclose(out[0], out[0].T)


def test_power_spectrum_white_noise(rng):
    n = 32
    x = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    ft = fft.fft2_center(x)
    ps = spectrum.power_spectrum(ft, n // 2, 2)
    # white noise: flat spectrum ~ n^2 per pixel
    assert np.all(np.asarray(ps[1:]) > 0)
    mid = np.asarray(ps[2:14])
    assert mid.max() / mid.min() < 5.0


def test_fsc_identical_volumes(rng):
    n = 16
    v = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    ft = fft.fft3_center(v)
    fsc = spectrum.frc_fsc(ft, ft, n // 2, 3)
    np.testing.assert_allclose(fsc, 1.0, atol=1e-4)


def test_fsc_independent_noise(rng):
    n = 32
    a = fft.fft3_center(jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32)))
    b = fft.fft3_center(jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32)))
    fsc = spectrum.frc_fsc(a, b, n // 2, 3)
    assert np.all(np.abs(np.asarray(fsc[4:])) < 0.3)


def test_res_p():
    fsc = jnp.asarray([1.0, 1.0, 0.9, 0.8, 0.5, 0.1, 0.05])
    assert int(spectrum.res_p(fsc, 0.143)) == 4
    assert int(spectrum.res_p(fsc, 0.6)) == 3


def test_low_pass_filter(rng):
    n = 32
    x = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    ft = fft.fft2_center(x)
    lp = filters.low_pass_filter(ft, 0.2, 0.05, 2)
    r = fft.radius_grid_2d(n) / n
    # fully passed below thres, zeroed above thres+ew
    np.testing.assert_allclose(
        np.asarray(lp)[np.asarray(r) < 0.19], np.asarray(ft)[np.asarray(r) < 0.19]
    )
    assert np.all(np.abs(np.asarray(lp)[np.asarray(r) > 0.26]) < 1e-6)


def test_b_factor_roundtrip(rng):
    n = 32
    x = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    ft = fft.fft3_center(x)
    b_true = -300.0
    damped = filters.b_factor_filter(ft, -b_true, 3)  # exp(+0.5*300*f^2)? no:
    # b_factor_filter multiplies by exp(-0.5 * b * f^2); use b = 300 to damp
    damped = filters.b_factor_filter(ft, 300.0, 3)
    b_est = spectrum.b_factor_est(damped, n, n // 2 - 2, 2)
    # white noise has flat |F|; after damping, fitted B (2*slope of log amp
    # vs f^2) should recover ~ -300/2*2 = -300... sign: slope = -0.5*300 =>
    # b_est = 2*slope = -300
    assert -450 < float(b_est) < -150


def test_random_phase_preserves_low_freq(rng):
    n = 16
    v = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    ft = fft.fft3_center(v)
    out = spectrum.random_phase(jax.random.PRNGKey(0), ft, 4, 3)
    u = np.rint(np.asarray(fft.radius_grid_3d(n)))
    keep = u <= 4
    np.testing.assert_allclose(np.asarray(out)[keep], np.asarray(ft)[keep])
    # amplitudes preserved everywhere
    np.testing.assert_allclose(np.abs(out), np.abs(ft), rtol=1e-4)
    # result still the spectrum of a real map
    back = fft.ifft3_center(out)
    assert float(jnp.max(jnp.abs(back.imag))) < 1e-3


def test_mkb_kernels():
    # normalized at r=0
    np.testing.assert_allclose(float(kernels.mkb_ft(0.0, 1.9, 15.0)), 1.0, atol=1e-5)
    # compact support
    assert float(kernels.mkb_ft(2.0, 1.9, 15.0)) == 0.0
    # tik_rl: sinc^2
    np.testing.assert_allclose(float(kernels.tik_rl(0.0)), 1.0)
    np.testing.assert_allclose(float(kernels.tik_rl(0.5)), (np.sin(np.pi / 2) / (np.pi / 2)) ** 2, rtol=1e-5)
    # mkb_rl positive in main lobe, decaying
    a = float(kernels.mkb_rl(0.0, 1.9, 15.0))
    b = float(kernels.mkb_rl(0.2, 1.9, 15.0))
    assert a > b > 0


def test_pixel_ring_roundtrip(rng):
    n = 32
    ring = pixels.pixel_ring(n, 2, 10)
    # small bands use the sub-bucket ladder {256, 512, 1024}; the padded
    # size must be one of the allowed static shapes and cover n_real
    assert ring.n in (256, 512, 1024) or ring.n % pixels.PIXEL_BUCKET == 0
    assert ring.n >= ring.n_real
    x = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    ft = fft.fft2_center(x)
    vals = pixels.gather_pixels(ft, ring)
    back = pixels.scatter_pixels(vals, ring, n)
    # scattered result is Hermitian: ifft real
    img = fft.ifft2_center(back)
    assert float(jnp.max(jnp.abs(img.imag))) < 1e-3
    # and band-limited copy of the original in [2,10)
    u = np.rint(np.asarray(fft.radius_grid_2d(n)))
    band = (u >= 2) & (u < 10) & (np.sqrt(np.asarray(fft.radius_grid_2d(n))**2) < 10)
    got = np.asarray(back)
    want = np.asarray(ft)
    sel = (u >= 2) & (u < 10)
    # compare a few pixels in the band
    np.testing.assert_allclose(got[sel], want[sel], rtol=1e-4, atol=1e-3)


def test_soft_mask():
    m = mask.soft_mask_shape((32, 32, 32), 8.0, 3.0)
    assert float(m[16, 16, 16]) == 1.0
    assert float(m[0, 0, 0]) == 0.0
    # monotone edge
    prof = np.asarray(m[16, 16, 16:])
    assert np.all(np.diff(prof) <= 1e-6)
