"""Empirical test: which vectorized gather forms does Pallas/Mosaic support
on this chip, and how fast are they vs XLA's gather?"""

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
HW = H * W
S = 64
N = HW  # one sample set per pixel


def timeit(fn, *args, n_warmup=2, n_iter=10):
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
flat = img.ravel()
idx = jnp.asarray(rng.integers(0, HW, (S, N)), jnp.int32)

# XLA baseline
@jax.jit
def xla_take(idx):
    return jnp.take(flat, idx, mode="clip")

xla_take(idx)
print(f"XLA take (S,N)           : {timeit(xla_take, idx)*1e3:8.2f} ms")


# --- Pallas variant 1: jnp.take of a VMEM-resident flat image
BLK = 2048  # lanes per grid step


def kernel_take(img_ref, idx_ref, out_ref):
    flat = img_ref[:].reshape(-1)
    out_ref[:] = jnp.take(flat, idx_ref[:], mode="clip")


@jax.jit
def pallas_take(img, idx):
    return pl.pallas_call(
        kernel_take,
        out_shape=jax.ShapeDtypeStruct((S, N), jnp.float32),
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(img, idx)


try:
    out = pallas_take(img, idx)
    ok = bool(jnp.allclose(out, xla_take(idx)))
    print(f"Pallas jnp.take          : {timeit(pallas_take, img, idx)*1e3:8.2f}"
          f" ms   correct={ok}")
except Exception as e:
    print(f"Pallas jnp.take          : FAILED {type(e).__name__}: "
          f"{str(e)[:200]}")


# --- Pallas variant 2: take_along_axis rows (gather along lanes)
def kernel_taa(img_ref, idx_ref, out_ref):
    # gather along the lane dim: one row of the flat image per sublane?
    flat = img_ref[:].reshape(1, -1)
    src = jnp.broadcast_to(flat, (8, flat.shape[1]))
    for s in range(S // 8):
        sub = idx_ref[s * 8:(s + 1) * 8, :]
        out_ref[s * 8:(s + 1) * 8, :] = jnp.take_along_axis(
            src, sub, axis=1)


@jax.jit
def pallas_taa(img, idx):
    return pl.pallas_call(
        kernel_taa,
        out_shape=jax.ShapeDtypeStruct((S, N), jnp.float32),
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((H, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(img, idx)


try:
    out = pallas_taa(img, idx)
    ok = bool(jnp.allclose(out, xla_take(idx)))
    print(f"Pallas take_along_axis   : {timeit(pallas_taa, img, idx)*1e3:8.2f}"
          f" ms   correct={ok}")
except Exception as e:
    print(f"Pallas take_along_axis   : FAILED {type(e).__name__}: "
          f"{str(e)[:200]}")


# --- XLA: packed-u32 gather (4 corners in one take)
img_u8 = (img * 255.0).astype(jnp.uint8)
packed = (img_u8[:-1, :-1].astype(jnp.uint32)
          | (img_u8[:-1, 1:].astype(jnp.uint32) << 8)
          | (img_u8[1:, :-1].astype(jnp.uint32) << 16)
          | (img_u8[1:, 1:].astype(jnp.uint32) << 24))
packed_flat = packed.ravel()


@jax.jit
def xla_take_packed(idx):
    v = jnp.take(packed_flat, idx, mode="clip")
    c00 = (v & 0xFF).astype(jnp.float32)
    c01 = ((v >> 8) & 0xFF).astype(jnp.float32)
    c10 = ((v >> 16) & 0xFF).astype(jnp.float32)
    c11 = ((v >> 24) & 0xFF).astype(jnp.float32)
    return (c00 + c01 + c10 + c11) * (1.0 / 255.0)


xla_take_packed(idx)
print(f"XLA packed-u32 take      : {timeit(xla_take_packed, idx)*1e3:8.2f} ms")
