"""Layout probe: (N,) 1-D vs (H, W) 2-D elementwise throughput on TPU."""

import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

H, W = 480, 640
N = H * W
rng = np.random.default_rng(0)
a1 = jnp.asarray(rng.random(N), jnp.float32)
a2 = jnp.asarray(rng.random((H, W)), jnp.float32)


def bench(fn, *args, n=100):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n


def work(x):
    # ~40 elementwise ops incl. div/sqrt, mimicking _pixel_geometry density
    y = x
    for _ in range(5):
        y = y * 1.0001 + 0.5
        y = jnp.sqrt(y * y + 1.0)
        y = y / (x + 2.0)
        y = jnp.where(y > 0.5, y, 1.0 - y)
    return y


f1 = jax.jit(work)
f2 = jax.jit(work)
print(f"(N,)  chain: {bench(f1, a1)*1e3:7.3f} ms")
print(f"(H,W) chain: {bench(f2, a2)*1e3:7.3f} ms")

# gather cost probe: take with int32 indices (N,) from (H*W,) flat image
idx = jnp.asarray(rng.integers(0, N, N), jnp.int32)
g = jax.jit(lambda img, i: jnp.take(img, i, mode="clip"))
print(f"random gather (N,) from flat: {bench(g, a1, idx)*1e3:7.3f} ms")
idx2 = idx.reshape(H, W)
g2 = jax.jit(lambda img, i: jnp.take(img.ravel(), i, mode="clip"))
print(f"random gather (H,W) from flat: {bench(g2, a2, idx2)*1e3:7.3f} ms")
