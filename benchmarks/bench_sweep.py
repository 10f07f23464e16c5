"""On-chip: sweep vs scattered update_depth at 480x640, pallas-vs-xla check."""

import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from bench import load_scene, semi_dense_setup, N_REF_SAMPLES
from tadataka_tpu.vo.semi_dense.estimator import update_depth
from tadataka_tpu.vo.semi_dense.sweep import update_depth_sweep


def timeit(fn, *args, n_warmup=2, n_iter=10, **kw):
    for _ in range(n_warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    ds, camera_model, g0, g1, pose0, pose1, D0, scene = load_scene()
    cam, params, kf, refs, prior, variance, age = semi_dense_setup(
        camera_model, g0, g1, pose0, pose1, D0)
    prior = jnp.asarray(prior)
    variance = jnp.asarray(variance)
    age = jnp.asarray(age)

    d_sw, v_sw, f_sw = update_depth_sweep(kf, refs, age, prior, variance,
                                          params, n_planes=64)
    dt_sw = timeit(update_depth_sweep, kf, refs, age, prior, variance,
                   params, n_planes=64)
    print(f"sweep (pallas) : {dt_sw*1e3:8.2f} ms")

    d_sx, v_sx, f_sx = update_depth_sweep(kf, refs, age, prior, variance,
                                          params, n_planes=64,
                                          use_pallas=False)
    dt_sx = timeit(update_depth_sweep, kf, refs, age, prior, variance,
                   params, n_planes=64, use_pallas=False)
    print(f"sweep (xla)    : {dt_sx*1e3:8.2f} ms")

    same_d = np.allclose(np.asarray(d_sw), np.asarray(d_sx), atol=1e-4)
    same_f = np.array_equal(np.asarray(f_sw), np.asarray(f_sx))
    print(f"pallas == xla  : depth {same_d}  flags {same_f}  "
          f"(max d diff {np.abs(np.asarray(d_sw)-np.asarray(d_sx)).max():.2e})")

    d_sc, v_sc, f_sc = update_depth(kf, refs, age, prior, variance, params,
                                    n_ref_samples=N_REF_SAMPLES)
    dt_sc = timeit(update_depth, kf, refs, age, prior, variance, params,
                   n_ref_samples=N_REF_SAMPLES)
    print(f"scatter (old)  : {dt_sc*1e3:8.2f} ms   speedup "
          f"{dt_sc/dt_sw:.1f}x")

    # accuracy vs stereo GT on pixels both mark SUCCESS
    gt = np.asarray(D0)
    both = (np.asarray(f_sw) == 0) & (np.asarray(f_sc) == 0)
    e_sw = np.abs(np.asarray(d_sw) - gt)[both]
    e_sc = np.abs(np.asarray(d_sc) - gt)[both]
    print(f"success sweep {float((np.asarray(f_sw)==0).mean()):.3f} "
          f"scat {float((np.asarray(f_sc)==0).mean()):.3f}")
    print(f"median |d-gt| vs stereo GT: sweep {np.median(e_sw):.3f} cm  "
          f"scatter {np.median(e_sc):.3f} cm")


if __name__ == "__main__":
    main()
