"""Empirical: tpu.dynamic_gather via take_along_axis in Pallas — correctness
and speed at image scale (480, 640)."""

import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 480, 640


def timeit(fn, *args, n_warmup=2, n_iter=20):
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((H, W)), jnp.float32)
idx_rows = jnp.asarray(rng.integers(0, H, (H, W)), jnp.int32)   # axis=0
idx_cols = jnp.asarray(rng.integers(0, W, (H, W)), jnp.int32)   # axis=1


def k_axis0(img_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(img_ref[:], idx_ref[:], axis=0)


def k_axis1(img_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(img_ref[:], idx_ref[:], axis=1)


def make(kernel):
    @jax.jit
    def f(img, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(img, idx)
    return f


for name, kernel, idx, axis in [("axis=0 (rows)", k_axis0, idx_rows, 0),
                                ("axis=1 (cols)", k_axis1, idx_cols, 1)]:
    try:
        f = make(kernel)
        out = f(img, idx)
        expect = jnp.take_along_axis(img, idx, axis=axis)
        ok = bool(jnp.array_equal(out, expect))
        dt = timeit(f, img, idx)
        print(f"pallas take_along_axis {name}: {dt*1e6:9.1f} us  correct={ok}")
    except Exception as e:
        print(f"pallas take_along_axis {name}: FAILED "
              f"{type(e).__name__}: {str(e)[:300]}")

# XLA versions for comparison
for name, idx, axis in [("axis=0", idx_rows, 0), ("axis=1", idx_cols, 1)]:
    f = jax.jit(lambda img, idx, a=axis: jnp.take_along_axis(img, idx, axis=a))
    f(img, idx)
    print(f"XLA    take_along_axis {name}: {timeit(f, img, idx)*1e6:9.1f} us")

# a fused 20-plane version to estimate per-warp amortized cost
S = 16


def k_multi(img_ref, idxr_ref, idxc_ref, out_ref):
    acc = jnp.zeros((H, W), jnp.float32)
    for s in range(S):
        t1 = jnp.take_along_axis(img_ref[:], idxc_ref[:], axis=1)
        t2 = jnp.take_along_axis(t1, idxr_ref[:], axis=0)
        acc = acc + t2 * (1.0 + s)
    out_ref[:] = acc


@jax.jit
def f_multi(img, idxr, idxc):
    return pl.pallas_call(
        k_multi,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(img, idxr, idxc)


try:
    out = f_multi(img, idx_rows, idx_cols)
    dt = timeit(f_multi, img, idx_rows, idx_cols)
    print(f"pallas {S}x(2-pass warp)     : {dt*1e6:9.1f} us  "
          f"({dt/S*1e6:6.1f} us/warp)")
except Exception as e:
    print(f"pallas {S}x warp: FAILED {type(e).__name__}: {str(e)[:300]}")
