"""Half-map postprocessing: mask-corrected FSC, merge, FSC weighting,
B-factor sharpening.

Mirrors the reference Postprocess (src/Postprocess.cpp:50-232,
appsrc/thunder_postprocess.cpp):

1. unmasked FSC of the two half maps,
2. masked FSC,
3. randomize phases of both halves past the shell where unmasked FSC drops
   below 0.8 (RANDOM_PHASE_THRES), mask, re-FSC,
4. true FSC = (FSC_masked - FSC_rand) / (1 - FSC_rand) past that shell
   (the Chen/Cryo-EM random-phase mask correction),
5. merge halves (average), low-pass at the FSC=0.143 cutoff is implicit in
   the FSC weighting, Cref = sqrt(2 FSC / (1 + FSC)),
6. estimate B-factor by Guinier fit over [bfactor_res, cutoff] and sharpen,
7. soft-mask the sharpened map.
"""

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..dtypes import FSC_CUTOFF
from ..ops import fft as fft_ops
from ..ops import filters, spectrum

RANDOM_PHASE_THRES = 0.8


@dataclass
class PostprocessResult:
    map: np.ndarray  # sharpened, masked merged map
    fsc_unmasked: np.ndarray
    fsc_masked: np.ndarray
    fsc_true: np.ndarray
    res_shell: int
    res_a: float
    b_factor: float


def postprocess(half_a, half_b, mask, pixel_size, thres=FSC_CUTOFF, seed=0):
    """half_a/half_b: (n, n, n) real maps; mask: (n, n, n) in [0, 1]."""
    n = half_a.shape[-1]
    a = jnp.asarray(half_a)
    b = jnp.asarray(half_b)
    m = jnp.asarray(mask)

    ft_a = fft_ops.fft3_center(a)
    ft_b = fft_ops.fft3_center(b)
    fsc_u = spectrum.frc_fsc(ft_a, ft_b, n // 2, 3)

    ft_am = fft_ops.fft3_center(a * m)
    ft_bm = fft_ops.fft3_center(b * m)
    fsc_m = spectrum.frc_fsc(ft_am, ft_bm, n // 2, 3)

    # random-phase correction past the 0.8 shell of the UNMASKED FSC
    r_rand = int(spectrum.res_p(fsc_u, RANDOM_PHASE_THRES, r_low=1))
    key = jax.random.PRNGKey(seed)
    ka, kb = jax.random.split(key)
    ft_ar = spectrum.random_phase(ka, ft_a, r_rand, 3)
    ft_br = spectrum.random_phase(kb, ft_b, r_rand, 3)
    ar = fft_ops.ifft3_center(ft_ar).real * m
    br = fft_ops.ifft3_center(ft_br).real * m
    fsc_r = spectrum.frc_fsc(
        fft_ops.fft3_center(ar), fft_ops.fft3_center(br), n // 2, 3
    )

    shells = jnp.arange(n // 2)
    corrected = (fsc_m - fsc_r) / jnp.maximum(1 - fsc_r, 1e-6)
    fsc_t = jnp.where(shells > r_rand + 2, corrected, fsc_m)

    res_shell = int(spectrum.res_p(fsc_t, thres, r_low=1))
    res_a = float(n * pixel_size / max(res_shell, 1))

    # merge, FSC-weight, sharpen
    merged = (ft_am + ft_bm) / 2
    merged = filters.fsc_weighting_filter(merged, fsc_t, 3)
    b_factor = float(
        spectrum.b_factor_est(merged, n, max(res_shell, 4), min(3, res_shell))
    )
    sharp = filters.b_factor_filter(merged, b_factor, 3)
    sharp = filters.low_pass_filter(
        sharp, res_shell / n, 2.0 / n, 3
    )
    out = fft_ops.ifft3_center(sharp).real * m

    return PostprocessResult(
        map=np.asarray(out),
        fsc_unmasked=np.asarray(fsc_u),
        fsc_masked=np.asarray(fsc_m),
        fsc_true=np.asarray(fsc_t),
        res_shell=res_shell,
        res_a=res_a,
        b_factor=b_factor,
    )
