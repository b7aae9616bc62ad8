"""Precision policy.

The reference switches the whole build between float/double via the RFLOAT
typedef (include/Precision.h:64-139) and keeps pose/ACG math in double even in
single-precision builds (include/Particle.h:148-165).

On TPU, float64 is emulated and slow; the policy here is:

- ``real_dtype``/``complex_dtype``: float32/complex64 for all image/volume math
  (the MXU/VPU native path).
- pose statistics (4x4 ACG scatter matrices, quaternion normalization) stay in
  float32 but accumulate via well-conditioned formulations (eigh of symmetric
  4x4, two-pass variance) — validated against float64 in tests.
"""

import numpy as np

import jax
import jax.numpy as jnp

real_dtype = jnp.float32
complex_dtype = jnp.complex64
index_dtype = jnp.int32

# Matches the reference's reported resolution rounding behaviour.
FSC_CUTOFF = 0.143  # docs/README.md FSC reporting threshold


@jax.jit
def _combine_complex(re, im):
    return jax.lax.complex(re, im)


def device_complex(x):
    """Host complex array -> device complex64 WITHOUT a complex transfer.

    Some PJRT backends (the remote axon TPU tunnel) cannot transfer complex
    buffers in either direction; uploading real and imaginary planes
    separately and combining on device works everywhere."""
    x = np.asarray(x)
    re = jnp.asarray(np.ascontiguousarray(x.real, dtype=np.float32))
    im = jnp.asarray(np.ascontiguousarray(x.imag, dtype=np.float32))
    return _combine_complex(re, im)
