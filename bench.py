"""Benchmark: semi-dense VO full-step throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

The step is the flagship pipeline of the reference's semi_dense_vo example
(/root/reference/examples/semi_dense_vo.py:174-207): DVO pose tracking +
age increment + depth/variance propagation + full-map epipolar depth update.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
anchor is self-measured — the same per-pixel estimate() algorithm as a
straight NumPy loop (the shape of the reference's original Python
implementation, later ported to Rust), timed on a pixel subsample of the
same frame and extrapolated to the full map.  vs_baseline = our frames/s
divided by the anchor's frames/s.
"""

import json
import time

import numpy as np

H, W = 240, 320
FOCAL = 240.0
N_REF_SAMPLES = 64


def build_scene():
    import jax.numpy as jnp
    from tadataka_tpu.core.pose import Pose
    from tadataka_tpu.dataset import PlaneSceneDataset

    poses = [Pose.identity(),
             Pose.from_rotvec(jnp.array([0.0, 0.01, 0.0]),
                              jnp.array([0.5, 0.02, 0.05]))]
    ds = PlaneSceneDataset(n_frames=2, image_shape=(H, W),
                           focal_length=(FOCAL, FOCAL), poses=poses,
                           plane_origin=(0.0, 0.0, 10.0),
                           plane_normal=(0.05, -0.02, -1.0))
    return ds[0], ds[1]


def bench_tpu_step(frame0, frame1, n_warmup=2, n_iter=10):
    import jax
    import jax.numpy as jnp
    from functools import partial
    from tadataka_tpu.camera import CameraParameters
    from tadataka_tpu.core.transforms import motion_matrix
    from tadataka_tpu.vo.dvo import estimate_pose_pyramid
    from tadataka_tpu.vo.semi_dense import (
        SemiDenseParams, make_frame, propagate, increment_age)
    from tadataka_tpu.vo.semi_dense.estimator import (
        update_depth, safe_invert)
    from tadataka_tpu.vo.semi_dense.frame import stack_frames

    cam = CameraParameters.create((FOCAL, FOCAL), (W / 2, H / 2))
    params = SemiDenseParams.create(2.0, 50.0, ref_step_size=0.002,
                                    min_gradient=0.01)
    kf = make_frame(cam, frame0.image, frame0.pose.T)
    rf = make_frame(cam, frame1.image, frame1.pose.T)
    refs = stack_frames([rf])
    cm = frame0.camera_model

    gt = np.asarray(frame0.depth_map)
    rng = np.random.default_rng(0)
    prior = jnp.asarray(gt + rng.uniform(-1, 1, gt.shape).astype(np.float32))
    variance = 0.05 * jnp.ones((H, W))
    age = jnp.ones((H, W), dtype=jnp.int32)
    I0 = jnp.asarray(frame0.image, jnp.float32)
    I1 = jnp.asarray(frame1.image, jnp.float32)
    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, dtype=jnp.float32)

    # the whole frame step is ONE jitted XLA program: DVO pyramid, age
    # scatter, propagation, and the full-map epipolar depth update fuse
    # into a single dispatch
    @jax.jit
    def step(I0, D0, V0, age, I1):
        weights = safe_invert(V0)
        R, t = estimate_pose_pyramid(cm, cm, I0, D0, I1, weights,
                                     eye, zero, 4, 10, 1.5, "map")
        T10 = motion_matrix(R, t)
        age1 = increment_age(age, cam, cam, T10, D0)
        d1, v1 = propagate(T10, cam, cam, D0, V0, 10.0, 1.0, 0.01)
        return update_depth(kf, refs, age1, d1, v1, params,
                            n_ref_samples=N_REF_SAMPLES)

    for _ in range(n_warmup):
        jax.block_until_ready(step(I0, prior, variance, age, I1))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(I0, prior, variance, age, I1)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    return 1.0 / dt


def bench_numpy_anchor(frame0, frame1, n_pixels=1500):
    """The same per-pixel epipolar estimate as a plain NumPy loop, timed on
    a subsample and extrapolated to the full H*W map (the anchor stands in
    for the reference's per-pixel serial implementation)."""
    img_k = np.asarray(frame0.image, dtype=np.float64)
    img_r = np.asarray(frame1.image, dtype=np.float64)
    T_wk = np.asarray(frame0.pose.T, dtype=np.float64)
    T_wr = np.asarray(frame1.pose.T, dtype=np.float64)
    T_rk = np.linalg.inv(T_wr) @ T_wk
    fx = fy = FOCAL
    cx, cy = W / 2, H / 2
    gt = np.asarray(frame0.depth_map, dtype=np.float64)
    rng = np.random.default_rng(0)
    prior_d = gt + rng.uniform(-1, 1, gt.shape)
    step_size = 0.002

    def interp(img, x, y):
        x0, y0 = int(x), int(y)
        x0 = min(max(x0, 0), W - 2)
        y0 = min(max(y0, 0), H - 2)
        ax, ay = x - x0, y - y0
        return ((1 - ax) * (1 - ay) * img[y0, x0]
                + ax * (1 - ay) * img[y0, x0 + 1]
                + (1 - ax) * ay * img[y0 + 1, x0]
                + ax * ay * img[y0 + 1, x0 + 1])

    def warp(x, depth):
        p = np.array([x[0] * depth, x[1] * depth, depth, 1.0])
        q = T_rk @ p
        return q[:2] / q[2], q[2]

    pix = rng.integers(8, min(H, W) - 8, size=(n_pixels, 2))
    t0 = time.perf_counter()
    for py, px in pix:
        d = prior_d[py, px]
        inv_d = 1.0 / d
        v = 0.05
        lo, hi = max(inv_d - 2 * v, 0.02), min(inv_d + 2 * v, 0.5)
        dmin, dmax = 1.0 / hi, 1.0 / lo
        x_key = np.array([(px - cx) / fx, (py - cy) / fy])
        x_min, _ = warp(x_key, dmin)
        x_max, _ = warp(x_key, dmax)
        direction = x_max - x_min
        norm = np.linalg.norm(direction)
        n = int(norm / step_size)
        if n < 5:
            continue
        u = direction / (norm + 1e-16)
        # key patch
        key_i = np.array([
            interp(img_k, px + s, py) for s in (-2, -1, 0, 1, 2)])
        if np.linalg.norm(np.diff(key_i)) < 0.01:
            continue
        best, arg = np.inf, 0
        ref_i = np.empty(n)
        for i in range(n):
            xr = x_min + i * step_size * u
            ur = np.array([xr[0] * fx + cx, xr[1] * fy + cy])
            ref_i[i] = interp(img_r, ur[0], ur[1])
        kn = key_i / np.linalg.norm(key_i)
        for i in range(n - 4):
            w_ = ref_i[i:i + 5]
            wn = w_ / (np.linalg.norm(w_) + 1e-16)
            e = np.sum((wn - kn) ** 2)
            if e < best:
                best, arg = e, i
    dt = time.perf_counter() - t0
    per_pixel = dt / n_pixels
    return 1.0 / (per_pixel * H * W)  # frames/s for the full map


def main():
    frame0, frame1 = build_scene()
    fps_tpu = bench_tpu_step(frame0, frame1)
    fps_anchor = bench_numpy_anchor(frame0, frame1)
    result = {
        "metric": f"semi-dense VO full step (DVO+age+propagate+update_depth)"
                  f" {H}x{W}",
        "value": round(fps_tpu, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_tpu / fps_anchor, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
