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

import jax.numpy as jnp

real_dtype = jnp.float32
complex_dtype = jnp.complex64
index_dtype = jnp.int32

# Matches the reference's reported resolution rounding behaviour.
FSC_CUTOFF = 0.143  # docs/README.md FSC reporting threshold
