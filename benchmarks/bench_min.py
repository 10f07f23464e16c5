"""Robust (min-of-batches) timing of the semi-dense fast paths.

The axon tunnel adds heavy-tailed scheduling noise (same program
measured 2.8-15 ms across processes); the MINIMUM over several timed
batches estimates true device+dispatch cost.
"""

import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from bench import load_scene, semi_dense_setup
from tadataka_tpu.vo.semi_dense import make_frame
from tadataka_tpu.vo.semi_dense.frame import stack_frames
from tadataka_tpu.vo.semi_dense.fast import plan_update, update_depth_fast


def bench_min(fn, n_iter=20, n_batch=5):
    out = fn()
    float(sum(jnp.sum(o) for o in out))
    best = np.inf
    for _ in range(n_batch):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn()
        float(sum(jnp.sum(o) for o in out))
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def main():
    ds, camera_model, g0, g1, pose0, pose1, D0, scene = load_scene()
    cam, params, kf, refs, prior, variance, age = semi_dense_setup(
        camera_model, g0, g1, pose0, pose1, D0)
    prior = jnp.asarray(prior)
    variance = jnp.asarray(variance)
    age = jnp.asarray(age)

    plan = plan_update(kf, refs, params)
    print("VO pair plan:", plan)
    dt = bench_min(lambda: update_depth_fast(kf, refs, age, prior, variance,
                                             params, plan=plan))
    print(f"  tent update_depth (min): {dt*1e3:8.2f} ms = {1/dt:6.1f} fps")

    from tadataka_tpu.dataset.image_io import rgb2gray
    L0, R0 = ds[0]
    gr = np.asarray(rgb2gray(R0.image))
    refs2 = stack_frames([make_frame(cam, jnp.asarray(gr), R0.pose.T)])
    plan2 = plan_update(kf, refs2, params)
    print("stereo pair plan:", plan2)
    dt2 = bench_min(lambda: update_depth_fast(kf, refs2, age, prior, variance,
                                              params, plan=plan2))
    print(f"  rect update_depth (min): {dt2*1e3:8.2f} ms = {1/dt2:6.1f} fps")


if __name__ == "__main__":
    main()
