"""Honest on-chip timing of the semi-dense fast paths.

CRITICAL methodology note: through the axon tunnel,
``jax.block_until_ready`` does NOT reliably wait for execution — timings
taken with it alone can be off by 1000x in either direction.  Every
timing here forces completion with a scalar host read per iteration
batch (float(jnp.sum(...))).
"""

import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from bench import load_scene, semi_dense_setup
from tadataka_tpu.flags import Flag
from tadataka_tpu.vo.semi_dense import make_frame
from tadataka_tpu.vo.semi_dense.frame import stack_frames
from tadataka_tpu.vo.semi_dense.fast import plan_update, update_depth_fast


def bench(fn, n=10):
    out = fn()
    s = float(sum(jnp.sum(o) for o in out))       # force
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    s = float(sum(jnp.sum(o) for o in out))       # force once at end
    return (time.perf_counter() - t0) / n


def main():
    ds, camera_model, g0, g1, pose0, pose1, D0, scene = load_scene()
    cam, params, kf, refs, prior, variance, age = semi_dense_setup(
        camera_model, g0, g1, pose0, pose1, D0)
    prior = jnp.asarray(prior)
    variance = jnp.asarray(variance)
    age = jnp.asarray(age)
    gt = np.asarray(D0)

    # VO pair -> tent path
    plan = plan_update(kf, refs, params)
    print("VO pair plan:", plan)
    t0 = time.perf_counter()
    d, v, f = update_depth_fast(kf, refs, age, prior, variance, params,
                                plan=plan)
    float(jnp.sum(d))
    print(f"  first call (compile): {time.perf_counter()-t0:.1f} s")
    dt = bench(lambda: update_depth_fast(kf, refs, age, prior, variance,
                                         params, plan=plan))
    print(f"  tent update_depth   : {dt*1e3:8.2f} ms")

    # stereo pair -> rect path
    from tadataka_tpu.dataset.image_io import rgb2gray
    L0, R0 = ds[0]
    gr = np.asarray(rgb2gray(R0.image))
    refs2 = stack_frames([make_frame(cam, jnp.asarray(gr), R0.pose.T)])
    plan2 = plan_update(kf, refs2, params)
    print("stereo pair plan:", plan2)
    t0 = time.perf_counter()
    d2, v2, f2 = update_depth_fast(kf, refs2, age, prior, variance, params,
                                   plan=plan2)
    float(jnp.sum(d2))
    print(f"  first call (compile): {time.perf_counter()-t0:.1f} s")
    dt2 = bench(lambda: update_depth_fast(kf, refs2, age, prior, variance,
                                          params, plan=plan2))
    print(f"  rect update_depth   : {dt2*1e3:8.2f} ms")
    f2 = np.asarray(f2)
    d2 = np.asarray(d2)
    succ = f2 == int(Flag.SUCCESS)
    print(f"  rect SUCCESS {succ.mean():.3f} "
          f"median |d-gt| {np.median(np.abs(d2-gt)[succ]):.2f} cm")

    # scattered baseline for comparison
    from tadataka_tpu.vo.semi_dense.estimator import update_depth
    t0 = time.perf_counter()
    d3, v3, f3 = update_depth(kf, refs, age, prior, variance, params)
    float(jnp.sum(d3))
    print(f"scatter first call    : {time.perf_counter()-t0:.1f} s")
    dt3 = bench(lambda: update_depth(kf, refs, age, prior, variance,
                                     params), n=3)
    print(f"  scatter update_depth: {dt3*1e3:8.2f} ms   "
          f"(tent speedup {dt3/dt:.1f}x, rect speedup {dt3/dt2:.1f}x)")


if __name__ == "__main__":
    main()
