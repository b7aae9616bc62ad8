"""thunder_tpu — a TPU-native cryo-EM single-particle analysis framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of thuem/THUNDER
(particle-filter 2D/3D classification and 3D refinement): Fourier-slice
projection, CTF modeling, adaptive particle-filter pose search over
SO(3) x translations x defocus, gridding back-projection with Wiener/C-balance
iteration, golden-standard FSC, and the surrounding toolchain (.thu metadata,
MRC I/O, postprocessing, masking, map utilities).

Layer map (bottom-up), mirroring the reference's capability inventory
(see SURVEY.md section 2):

- ``thunder_tpu.dtypes``        — precision policy (ref: include/Precision.h)
- ``thunder_tpu.geom``          — quaternions/Euler, symmetry groups,
                                  directional statistics (ACG/von Mises)
- ``thunder_tpu.io``            — MRC / .thu / STAR / BMP
- ``thunder_tpu.ops``           — CTF, FFT helpers, spectra/FSC, filters,
                                  masks, gridding kernels, translations,
                                  likelihood (fused Pallas/MXU + XLA fallback)
- ``thunder_tpu.core``          — Projector, Reconstructor, Particle filter,
                                  Model, Optimiser, Postprocess
- ``thunder_tpu.parallel``      — device mesh (half, data axes), collectives
- ``thunder_tpu.data``          — particle stack dataset + sharded loading
- ``thunder_tpu.cli``           — command-line tools
"""

__version__ = "0.1.0"
