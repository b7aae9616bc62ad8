"""Wiener/C-balance stage probe (r5): where do the ~10 s go, and what do
the candidate optimizations buy?

- FFT-pair C-balance iteration cost at the bench band (mc=293), single
  vs 2-half batched,
- direct small-stencil convolution alternative: the C-balance taper's
  discrete transform has ~blob-support (a ~ 2-4 voxels), so conv(T*W, K)
  is a tiny-kernel 3D conv; measure XLA conv3d with a 7^3/9^3 kernel,
- the final zero-embed + full-grid inverse FFT (m = 320).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    mc = 293
    m = 320
    rng = np.random.default_rng(0)

    def timeit(f, *a):
        float(f(*a))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    x1 = jnp.asarray(rng.normal(size=(mc, mc, mc)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(2, mc, mc, mc)).astype(np.float32))
    taper = jnp.asarray(rng.normal(size=(mc, mc, mc)).astype(np.float32))

    @jax.jit
    def it_single(x, taper, salt):
        c = (x + salt).astype(jnp.complex64)
        c_rl = jnp.fft.ifftn(c, axes=(-3, -2, -1))
        c2 = jnp.fft.fftn(c_rl * taper, axes=(-3, -2, -1))
        return jnp.max(jnp.abs(c2))

    t = timeit(it_single, x1, taper, 0.0)
    print(f"[cbal-iter single] {t*1e3:7.1f} ms", flush=True)
    t = timeit(it_single, x2, taper, 0.0)
    print(f"[cbal-iter 2-half batch] {t*1e3:7.1f} ms", flush=True)

    @jax.jit
    def it_rfft(x, taper, salt):
        # real-input variant: T*W is real; C is Hermitian
        c_rl = jnp.fft.irfftn(
            (x + salt)[..., :mc // 2 + 1].astype(jnp.complex64),
            s=(mc, mc, mc), axes=(-3, -2, -1))
        c2 = jnp.fft.rfftn(c_rl * taper, axes=(-3, -2, -1))
        return jnp.max(jnp.abs(c2))

    t = timeit(it_rfft, x1, taper, 0.0)
    print(f"[cbal-iter rfft single] {t*1e3:7.1f} ms", flush=True)
    t = timeit(it_rfft, x2, taper, 0.0)
    print(f"[cbal-iter rfft 2-half] {t*1e3:7.1f} ms", flush=True)

    for ks in (5, 7, 9):
        kern = jnp.asarray(rng.normal(size=(ks, ks, ks)).astype(np.float32))

        @jax.jit
        def conv3(x, k, salt):
            out = jax.lax.conv_general_dilated(
                (x + salt)[None, None], k[None, None],
                window_strides=(1, 1, 1), padding="SAME",
                dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
            return jnp.max(jnp.abs(out))

        try:
            t = timeit(conv3, x1, kern, 0.0)
            print(f"[conv3d {ks}^3 single] {t*1e3:7.1f} ms", flush=True)
            t = timeit(conv3, x2[:, None].reshape(2, 1, mc, mc, mc)[0:2, 0],
                       kern, 0.0)
        except Exception as e:  # noqa: BLE001
            print(f"[conv3d {ks}^3] FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    y = jnp.asarray(rng.normal(size=(m, m, m)).astype(np.float32))

    @jax.jit
    def final_ifft(y, salt):
        c = (y + salt).astype(jnp.complex64)
        return jnp.max(jnp.abs(jnp.fft.ifftn(c, axes=(-3, -2, -1)).real))

    t = timeit(final_ifft, y, 0.0)
    print(f"[final ifft m={m}] {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
