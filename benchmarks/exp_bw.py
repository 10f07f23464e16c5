"""HBM bandwidth + dispatch-overhead probes for this chip/tunnel."""

import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)


def bench(fn, *args, n=50):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    return (time.perf_counter() - t0) / n


for shape in [(32, 480, 640), (128, 480, 640)]:
    A = jnp.asarray(rng.random(shape), jnp.float32)
    B = jnp.asarray(rng.random(shape), jnp.float32)
    nbytes = A.size * 4

    add = jax.jit(lambda a, b: a + b)
    t = bench(add, A, B)
    print(f"{shape} add: {t*1e3:7.3f} ms -> {3*nbytes/t/1e9:7.1f} GB/s")

    red = jax.jit(lambda a: jnp.sum(a, axis=0))
    t = bench(red, A)
    print(f"{shape} sum axis0: {t*1e3:7.3f} ms -> {nbytes/t/1e9:7.1f} GB/s")

# tiny op: dispatch floor
x = jnp.ones((8, 128), jnp.float32)
f = jax.jit(lambda a: a * 2.0)
t = bench(f, x, n=200)
print(f"tiny op dispatch floor: {t*1e6:7.1f} us")

# chain of 20 tiny jitted calls (dependent) — per-dispatch cost when queued
g = jax.jit(lambda a: a + 1.0)
def chain(a):
    for _ in range(20):
        a = g(a)
    return a
t = bench(chain, x, n=50)
print(f"20-chained tiny dispatches: {t*1e6:7.1f} us total")
