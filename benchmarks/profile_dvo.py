"""Stage-level profile of DVO tracking (the r3 bottleneck: 12.9 fps).

Times, on the real chip, the candidate formulations of the per-iteration
image resample — the dominant cost per VERDICT r3 — plus the full pyramid:

  scatter   — interpolate(I1, us): 4 clipped 2-D gathers (current path)
  twopass   — axis-aligned take_along_axis passes (warp2pass style)
  level     — one full GN level (480x640) under each sampler
  pyramid   — estimate_pose_pyramid end to end

Run: python benchmarks/profile_dvo.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

cache = Path(__file__).resolve().parent.parent / ".jax_cache"
cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


def timeit(fn, n_warmup=2, n_iter=10):
    def force(out):
        leaves = jax.tree_util.tree_leaves(out)
        return float(sum(jnp.sum(o) for o in leaves))
    for _ in range(n_warmup):
        force(fn())
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn()
    force(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    from tadataka_tpu.core.interpolation import interpolate
    from tadataka_tpu.core.warp2pass import (
        gather_cols_bilinear, gather_rows_bilinear)

    H, W = 480, 640
    rng = np.random.default_rng(0)
    I1 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    # smooth few-pixel warp field like an inter-frame VO flow
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    dx = 5.0 * jnp.sin(ys / 97.0) + 3.0
    dy = 4.0 * jnp.cos(xs / 83.0) - 2.0
    us = jnp.stack([(xs + dx).ravel(), (ys + dy).ravel()], axis=-1)

    scatter = jax.jit(lambda img, u: interpolate(img, u))
    dt = timeit(lambda: scatter(I1, us))
    print(f"scatter interpolate  (1 ch, {H}x{W}): {dt*1e3:8.3f} ms")

    @jax.jit
    def twopass(img, X, Y):
        tmp = gather_cols_bilinear(img, X)
        return gather_rows_bilinear(tmp, Y)

    dt = timeit(lambda: twopass(I1, xs + dx, ys + dy))
    print(f"two-pass resample    (1 ch, {H}x{W}): {dt*1e3:8.3f} ms")

    # 3-channel variant (I, GX, GY for the FC path)
    I3 = jnp.stack([I1, I1, I1])

    @jax.jit
    def twopass3(img3, X, Y):
        W_ = img3.shape[-1]
        x0 = jnp.clip(jnp.floor(X), 0, W_ - 1.0)
        ax = X - x0
        x0i = x0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, W_ - 1)
        v0 = jnp.take_along_axis(img3, x0i[None], axis=2)
        v1 = jnp.take_along_axis(img3, x1i[None], axis=2)
        tmp = (1 - ax) * v0 + ax * v1
        H_ = img3.shape[-2]
        y0 = jnp.clip(jnp.floor(Y), 0, H_ - 1.0)
        ay = Y - y0
        y0i = y0.astype(jnp.int32)
        y1i = jnp.minimum(y0i + 1, H_ - 1)
        w0 = jnp.take_along_axis(tmp, y0i[None], axis=1)
        w1 = jnp.take_along_axis(tmp, y1i[None], axis=1)
        return (1 - ay) * w0 + ay * w1

    dt = timeit(lambda: twopass3(I3, xs + dx, ys + dy))
    print(f"two-pass resample    (3 ch, {H}x{W}): {dt*1e3:8.3f} ms")

    # ---------------- full pyramid under the current implementation
    from tadataka_tpu.camera import CameraModel, CameraParameters
    from tadataka_tpu.vo.dvo import estimate_pose_pyramid

    cam = CameraParameters.create((600.0, 600.0), (W / 2, H / 2))
    cm = CameraModel.create(cam)
    I0 = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
    D0 = jnp.asarray(rng.uniform(60, 100, (H, W)).astype(np.float32))
    wmap = jnp.ones_like(I0)
    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, dtype=jnp.float32)

    for method in ("ic", "fc"):
        dt = timeit(lambda m=method: estimate_pose_pyramid(
            cm, cm, I0, D0, I1, wmap, eye, zero, 5, 20, 1.5, "map", m),
            n_iter=5)
        print(f"pyramid current [{method}]:             {dt*1e3:8.3f} ms"
              f"  ({1/dt:6.2f} fps)")

    # per-level cost of the current IC loop (fixed 20 iters to see ceiling)
    from tadataka_tpu.vo.dvo import _estimate_level_ic
    from tadataka_tpu.camera import resize as camera_resize
    import math
    for level in range(5):
        scale = 1.0 / (1.5 ** level)
        sh = (max(int(math.ceil(H * scale)), 8),
              max(int(math.ceil(W * scale)), 8))
        cms = camera_resize(cm, scale)
        I0s = jax.image.resize(I0, sh, "linear")
        D0s = jax.image.resize(D0, sh, "linear")
        I1s = jax.image.resize(I1, sh, "linear")
        Ws = jax.image.resize(wmap, sh, "linear")
        f = jax.jit(lambda a, b, c, d, e, f_: _estimate_level_ic(
            cms, cms, a, b, c, d, e, f_, 20, "map"))
        dt = timeit(lambda: f(I0s, D0s, I1s, Ws, eye, zero), n_iter=5)
        print(f"level {level} ({sh[0]:4d}x{sh[1]:4d}) ic 20it: "
              f"{dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
