"""Host-side planner + dispatcher for the semi-dense depth update.

Picks, per (keyframe, refframe-history) geometry, the fastest TPU path
that is exact for that geometry:

  rect    — rectified disparity sweep (sweep_rect.py).  Chosen when every
            pair's rectifying rotation fits the shift-warp displacement
            budget — big LATERAL baselines (stereo pairs); the per-plane
            warp degenerates to a constant 1-px shift, and the whole
            epipolar search is gather-free.
  tent    — homography plane sweep with tent shift-sum warps (sweep.py::
            warp_plane_stack_tent).  Chosen when per-plane parallax is
            small — consecutive VO frames with ANY motion direction
            (including forward, where rectification is impossible).
  scatter — the general vmapped estimator (estimator.py::update_depth).
            Always correct; the fallback for big non-lateral baselines.

All plan quantities (plane counts, shift budgets, baseline signs) are
STATIC jit arguments, derived on the host from the 4x4 poses (tiny
host-side numpy; the image tensors never leave the device); they are
bucketed so a VO run compiles each path a handful of times, not per
frame.

Reference scope: this whole module replaces the implicit "one Rust loop
fits all" dispatch of /root/reference/src/semi_dense/semi_dense.rs:160 —
the TPU needs geometry-specialized programs to hit memory-bound speed.
"""

from typing import NamedTuple

import numpy as np

from tadataka_tpu.vo.semi_dense.params import N_KEY_SAMPLES
from tadataka_tpu.vo.semi_dense.rectify import (
    rectification_feasible, _np_homography_displacement)

RECT_MAX_DX = 32
RECT_MAX_DY = 32
TENT_BUDGET_MAX = 32   # per-plane warp budget cap (rotation + parallax)
KEY_BUDGET = 8
MAX_PLANES = 256
_BUDGET_BUCKETS = (4, 8, 12, 16, 24, 32, 48)


class UpdatePlan(NamedTuple):
    path: str            # 'rect' | 'tent' | 'scatter'
    n_planes: int
    flips: tuple         # rect only
    warp_budget: int     # tent only


def _bucket_budget(v):
    for b in _BUDGET_BUCKETS:
        if v <= b:
            return b
    return None


def _bucket_planes(v, cap=MAX_PLANES):
    n = int(np.ceil(max(v, 8) / 16.0)) * 16
    return min(n, cap)


def _np_K(f, c):
    return np.array([[f[0], 0, c[0]], [0, f[1], c[1]], [0, 0, 1.0]])


def _plane_H(T_rk, q, key_f, key_c, ref_f, ref_c):
    R, t = T_rk[:3, :3], T_rk[:3, 3]
    A = R + q * np.outer(t, [0.0, 0.0, 1.0])
    return _np_K(ref_f, ref_c) @ A @ np.linalg.inv(_np_K(key_f, key_c))


def _np_homography_span(Ha, Hb, image_shape, n=9):
    """Max |Ha x - Hb x| over a coarse grid (host-side numpy) — the
    longest epipolar track between two planes."""
    Hh, Ww = image_shape
    xs = np.linspace(0, Ww - 1.0, n)
    ys = np.linspace(0, Hh - 1.0, n)
    X, Y = np.meshgrid(xs, ys)
    P = np.stack([X.ravel(), Y.ravel(), np.ones(X.size)])
    Qa = Ha @ P
    Qb = Hb @ P
    if np.any(Qa[2] <= 1e-9) or np.any(Qb[2] <= 1e-9):
        return np.inf
    return float(np.hypot(Qa[0] / Qa[2] - Qb[0] / Qb[2],
                          Qa[1] / Qa[2] - Qb[1] / Qb[2]).max())


def plan_update(keyframe, refframes, params) -> UpdatePlan:
    """Choose the update path for this keyframe + refframe history.

    Host-side numpy on the 4x4 poses and intrinsics only.
    """
    key_T = np.asarray(keyframe.transform_wf, np.float64)
    key_f = np.asarray(keyframe.focal_length, np.float64)
    key_c = np.asarray(keyframe.offset, np.float64)
    image_shape = tuple(keyframe.image.shape)
    q0 = float(np.asarray(params.min_inv_depth))
    q1 = float(np.asarray(params.max_inv_depth))

    R_T = np.asarray(refframes.transform_wf, np.float64)
    ref_fs = np.asarray(refframes.focal_length, np.float64)
    ref_cs = np.asarray(refframes.offset, np.float64)
    n_refs = R_T.shape[0]

    # --- rect feasibility + disparity range -------------------------------
    rect_ok = True
    flips = []
    rect_range_px = 8.0
    for r in range(n_refs):
        T_rk = np.linalg.inv(R_T[r]) @ key_T
        ok, flip = rectification_feasible(
            T_rk, key_f, key_c, ref_fs[r], ref_cs[r], image_shape,
            RECT_MAX_DX, RECT_MAX_DY)
        if not ok:
            rect_ok = False
            break
        flips.append(flip)
        Rr, tr = T_rk[:3, :3], T_rk[:3, 3]
        fB = key_f[0] * np.linalg.norm(-Rr.T @ tr)
        rect_range_px = max(rect_range_px, fB * (q1 - q0))
    if rect_ok and 1.1 * rect_range_px + N_KEY_SAMPLES + 2 <= MAX_PLANES:
        # 10% headroom for the per-pixel v_z depth re-projection factor
        return UpdatePlan(
            'rect',
            _bucket_planes(1.1 * rect_range_px + N_KEY_SAMPLES + 2),
            tuple(flips), 0)

    # --- tent sweep feasibility ------------------------------------------
    d_max = 0.0
    range_px = 8.0
    tent_ok = True
    q_mid = 0.5 * (q0 + q1)
    for r in range(n_refs):
        T_rk = np.linalg.inv(R_T[r]) @ key_T
        Hs = {}
        for q in (q0, q_mid, q1):
            H_q = _plane_H(T_rk, q, key_f, key_c, ref_fs[r], ref_cs[r])
            dx, dy = _np_homography_displacement(H_q, image_shape)
            if not np.isfinite(dx) or not np.isfinite(dy):
                tent_ok = False
                break
            d_max = max(d_max, dx, dy)
            Hs[q] = H_q
        if not tent_ok:
            break
        span = _np_homography_span(Hs[q0], Hs[q1], image_shape)
        if not np.isfinite(span):
            tent_ok = False
            break
        range_px = max(range_px, span)
    if tent_ok:
        b = _bucket_budget(d_max + 1.0)
        if b is not None and b <= TENT_BUDGET_MAX:
            # ~1-px plane spacing along the longest epipolar track
            return UpdatePlan('tent', _bucket_planes(range_px + 6, cap=128),
                              (), b)

    return UpdatePlan('scatter', 0, (), 0)


def update_depth_fast(keyframe, refframes, age_map, prior_depth,
                      prior_variance, params, use_pallas=None, plan=None):
    """Dispatching semi-dense depth update; contract of
    estimator.update_depth (semi_dense.rs:160-237)."""
    from tadataka_tpu.vo.semi_dense.estimator import update_depth
    from tadataka_tpu.vo.semi_dense.sweep import update_depth_sweep
    from tadataka_tpu.vo.semi_dense.sweep_rect import update_depth_rect

    if plan is None:
        plan = plan_update(keyframe, refframes, params)
    if plan.path == 'rect':
        return update_depth_rect(
            keyframe, refframes, age_map, prior_depth, prior_variance,
            params, n_planes=plan.n_planes, flips=plan.flips,
            max_dx=RECT_MAX_DX, max_dy=RECT_MAX_DY, use_pallas=use_pallas)
    if plan.path == 'tent':
        return update_depth_sweep(
            keyframe, refframes, age_map, prior_depth, prior_variance,
            params, n_planes=plan.n_planes, use_pallas=use_pallas,
            warp_budget=plan.warp_budget, key_budget=KEY_BUDGET)
    return update_depth(keyframe, refframes, age_map, prior_depth,
                        prior_variance, params)
