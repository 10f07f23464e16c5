"""SSD kernel experiments: tile size, serial vs parallel formulation, DMA floor."""

import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-16
_INF = 3.0e38
S, H, W = 32, 480, 640
Kw = 5
M = S - Kw + 1

rng = np.random.default_rng(0)
V = jnp.asarray(rng.random((S, H, W)), jnp.float32)
K = jnp.asarray(rng.random((Kw, H, W)), jnp.float32)
mlo = jnp.zeros((H, W), jnp.float32)
mhi = jnp.full((H, W), float(M - 1), jnp.float32)


def bench(fn, *args, n=30):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    return (time.perf_counter() - t0) / n


# ---------------- copy-only kernel: DMA floor
def _copy_kernel(v_ref, o_ref):
    acc = v_ref[0]
    for s in range(1, S):
        acc = acc + v_ref[s]
    o_ref[:] = acc


def make_copy(Ht):
    grid = (H // Ht,)
    f = pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((S, Ht, W), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Ht, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return jax.jit(f)


# ---------------- current serial kernel at tile Ht
def _serial_kernel(v_ref, k_ref, mlo_ref, mhi_ref,
                   bm_ref, ec_ref, ep_ref, en_ref):
    Kl = [k_ref[k] for k in range(Kw)]
    Kn = jnp.sqrt(sum(k * k for k in Kl)) + EPSILON
    mlo = mlo_ref[:]
    mhi = mhi_ref[:]
    best = jnp.full(mlo.shape, _INF)
    bm = jnp.full(mlo.shape, -1.0)
    ec = jnp.full(mlo.shape, _INF)
    ep = jnp.full(mlo.shape, _INF)
    en = jnp.full(mlo.shape, _INF)
    prev_err = jnp.full(mlo.shape, _INF)
    for m in range(M):
        w = [v_ref[m + k] for k in range(Kw)]
        corr = sum(wk * Kl[k] for k, wk in enumerate(w))
        wn2 = sum(wk * wk for wk in w)
        valid = w[0] >= 0.0
        for wk in w[1:]:
            valid = valid & (wk >= 0.0)
        mf = jnp.float32(m)
        valid = valid & (mf >= mlo) & (mf <= mhi)
        err = 2.0 - 2.0 * corr / (jnp.sqrt(wn2) * Kn + EPSILON)
        err = jnp.where(valid, err, _INF)
        en = jnp.where(mf == bm + 1.0, err, en)
        is_new = err < best
        ep = jnp.where(is_new, prev_err, ep)
        en = jnp.where(is_new, _INF, en)
        ec = jnp.where(is_new, err, ec)
        bm = jnp.where(is_new, mf, bm)
        best = jnp.minimum(best, err)
        prev_err = err
    bm_ref[:] = bm
    ec_ref[:] = ec
    ep_ref[:] = ep
    en_ref[:] = en


# ---------------- parallel 2-pass kernel with scratch err volume
def _par_kernel(v_ref, k_ref, mlo_ref, mhi_ref,
                bm_ref, ec_ref, ep_ref, en_ref, errs):
    Kl = [k_ref[k] for k in range(Kw)]
    KnInv = jax.lax.rsqrt(sum(k * k for k in Kl) + EPSILON)
    mlo = mlo_ref[:]
    mhi = mhi_ref[:]
    for m in range(M):
        w = [v_ref[m + k] for k in range(Kw)]
        corr = sum(wk * Kl[k] for k, wk in enumerate(w))
        wn2 = sum(wk * wk for wk in w)
        valid = w[0] >= 0.0
        for wk in w[1:]:
            valid = valid & (wk >= 0.0)
        mf = jnp.float32(m)
        valid = valid & (mf >= mlo) & (mf <= mhi)
        err = 2.0 - 2.0 * corr * jax.lax.rsqrt(wn2 + EPSILON) * KnInv
        errs[m] = jnp.where(valid, err, _INF)
    best = errs[0]
    for m in range(1, M):
        best = jnp.minimum(best, errs[m])
    # first index achieving best
    bm = jnp.full(mlo.shape, jnp.float32(M))
    for m in range(M - 1, -1, -1):
        bm = jnp.where(errs[m] == best, jnp.float32(m), bm)
    ec = best
    ep = jnp.full(mlo.shape, _INF)
    en = jnp.full(mlo.shape, _INF)
    for m in range(M):
        ep = jnp.where(bm == jnp.float32(m + 1), errs[m], ep)
        en = jnp.where(bm == jnp.float32(m - 1), errs[m], en)
    nomatch = best >= _INF
    bm_ref[:] = jnp.where(nomatch, -1.0, bm)
    ec_ref[:] = ec
    ep_ref[:] = ep
    en_ref[:] = en


def make(kernel, Ht, scratch=False):
    grid = (H // Ht,)
    kw = {}
    if scratch:
        kw["scratch_shapes"] = [pltpu.VMEM((M, Ht, W), jnp.float32)]
    f = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.float32)] * 4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, Ht, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kw, Ht, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ht, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ht, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((Ht, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 4,
        **kw,
    )
    return jax.jit(f)


print(f"copy-only (DMA floor) Ht=8 : {bench(make_copy(8), V)*1e3:7.3f} ms")
print(f"copy-only (DMA floor) Ht=32: {bench(make_copy(32), V)*1e3:7.3f} ms")
print(f"copy-only (DMA floor) Ht=96: {bench(make_copy(96), V)*1e3:7.3f} ms")
for Ht in (8, 16, 32, 96):
    print(f"serial Ht={Ht:3d}: {bench(make(_serial_kernel, Ht), V, K, mlo, mhi)*1e3:7.3f} ms")
for Ht in (8, 16, 32):
    f = make(_par_kernel, Ht, scratch=True)
    print(f"par    Ht={Ht:3d}: {bench(f, V, K, mlo, mhi)*1e3:7.3f} ms")

# cross-check parity serial vs parallel
o1 = make(_serial_kernel, 8)(V, K, mlo, mhi)
o2 = make(_par_kernel, 8, scratch=True)(V, K, mlo, mhi)
for a, b, name in zip(o1, o2, ["bm", "ec", "ep", "en"]):
    print(name, "max|diff|", float(jnp.max(jnp.abs(a - b))))
