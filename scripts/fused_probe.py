"""Compare the Pallas fused global-scan kernel vs the lax.scan factored
path on the real chip: wall clock + numerical agreement on bench shapes."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from thunder_tpu.dtypes import device_complex
from thunder_tpu.ops import likelihood, pixels

n = 160
n_imgs, n_rot, n_tr, r_band = 256, 1024, 16, 40
rng = np.random.default_rng(0)
ring = pixels.pixel_ring(n, 3, r_band)
p = ring.n
pmask = np.asarray(ring.mask, np.float32)  # host constant: axon cannot pull device buffers back for constant embedding

imgs = device_complex((rng.normal(size=(n_imgs, p)) + 1j * rng.normal(size=(n_imgs, p))).astype(np.complex64))
ctf = jnp.asarray(rng.uniform(-1, 1, size=(n_imgs, p)).astype(np.float32))
sig_rcp = jnp.asarray((-0.5 / rng.uniform(0.5, 2, size=(n_imgs, p))).astype(np.float32))
proj = device_complex((rng.normal(size=(1, n_rot, p)) + 1j * rng.normal(size=(1, n_rot, p))).astype(np.complex64) * 0.05)
tra_ang = rng.uniform(-np.pi, np.pi, size=(n_tr, p)).astype(np.float32)
tra = device_complex(np.exp(1j * tra_ang).astype(np.complex64))

fn_scan = jax.jit(lambda *a: likelihood.global_search_weights(*a, pixel_mask=pmask))
fn_fused = jax.jit(lambda *a: likelihood.global_search_weights_fused(*a, pixel_mask=pmask))

ssum = jax.jit(lambda x: jnp.sum(x))


def bench(fn, label):
    # a host transfer (float) is the only reliable device sync over the
    # remote-TPU tunnel; block_until_ready returns early there
    out = fn(imgs, ctf, sig_rcp, proj, tra)
    float(ssum(out["baseline"]))
    t0 = time.perf_counter()
    k = 8
    for _ in range(k):
        out = fn(imgs, ctf, sig_rcp, proj, tra)
    float(ssum(out["baseline"]))
    dt = (time.perf_counter() - t0) / k
    flops = 2 * n_imgs * p * n_rot * (1 + 2 * n_tr)
    print(f"{label}: {dt*1e3:.1f} ms, {n_imgs/dt:.0f} p/s, MFU(bf16) {flops/dt/197e12*100:.2f}%")
    return out, dt

o1, t1 = bench(fn_scan, "lax.scan f32")
o2, t2 = bench(fn_fused, "pallas bf16")
print(f"speedup {t1/t2:.2f}x")

# agreement: posterior marginals normalised (softmax-level compare)
for k in ("wR", "wT", "wC"):
    a = np.asarray(o1[k], np.float64).reshape(n_imgs, -1)
    b = np.asarray(o2[k], np.float64).reshape(n_imgs, -1)
    a /= a.sum(1, keepdims=True)
    b /= b.sum(1, keepdims=True)
    err = np.abs(a - b).sum(1).max()
    print(f"{k}: max L1(normalised posterior) diff = {err:.3e}")
# argmax agreement
am = (np.asarray(o1["wR"]).reshape(n_imgs, -1).argmax(1) == np.asarray(o2["wR"]).reshape(n_imgs, -1).argmax(1)).mean()
print(f"wR argmax agreement: {am*100:.1f}%")
