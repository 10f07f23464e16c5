"""Feature-based visual odometry: keyframe window + PnP + triangulation + BA.

Parity surface: /root/reference/tadataka/vo/feature_based.py (the full
keyframe SfM loop: 2-view essential-matrix bootstrap, multi-keyframe
matching, PnP localization, per-keypoint-deduplicated triangulation,
windowed BA every frame once >= 3 keyframes, sliding-window eviction) and
/root/reference/tadataka/correspondence.py.

Design notes:
- The reference keys 3D points by random 18-byte hashes in bidicts
  (correspondence.py:10,50-60); here points get monotonically increasing
  integer ids in plain dicts — simpler, faster, deterministic.
- Device work (detection, descriptors, matching, RANSAC, PnP, triangulation,
  BA) runs in batched jitted kernels; the keyframe bookkeeping between
  steps is host-side Python, interleaved without blocking dispatch.
- The reference's ``estimate`` calls a nonexistent ``pose.local_to_world()``
  (feature_based.py:123 — API drift); here ``estimate`` returns the
  camera->world Pose explicitly.
"""

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from concurrent.futures import ThreadPoolExecutor

from tadataka_tpu.core.pose import Pose
from tadataka_tpu.core.triangulation import (
    two_view_triangulation, pairwise_triangulation, compute_depth_mask)
from tadataka_tpu.ba.api import try_run_ba
from tadataka_tpu.features import Matcher
from tadataka_tpu.features.brief import extract_features
from tadataka_tpu.pose_estimation import estimate_pose_change
from tadataka_tpu.pose_estimation.pnp import solve_pnp_packed
from tadataka_tpu.utils.exceptions import (
    NotEnoughInliersException, print_error)
from tadataka_tpu.utils.padding import pow2_cap, pad_rows, row_mask


from functools import partial


@partial(jax.jit, static_argnames=("max_keypoints", "threshold",
                                   "patch_size"))
def _extract_packed(image, camera_model, max_keypoints, threshold,
                    patch_size):
    """Detection + descriptors + normalization + host-fetch packing as
    ONE device program (one dispatch, one fetch per frame)."""
    feats = extract_features(image, max_keypoints=max_keypoints,
                             threshold=threshold, patch_size=patch_size)
    normalized = camera_model.normalize(feats.keypoints)
    packed = jnp.concatenate(
        [feats.keypoints, normalized,
         feats.mask[:, None].astype(jnp.float32)], axis=1)
    return feats, normalized, packed


def _fetch_pose(pose_dev):
    """Fetch a device Pose with ONE host read (R and t packed)."""
    flat = np.asarray(jnp.concatenate([pose_dev.R.ravel(), pose_dev.t]))
    return Pose(flat[:9].reshape(3, 3), flat[9:])


@partial(jax.jit, static_argnames=("threshold",))
def _guided_match_pnp_fn(descs_p, descs1, mask_p, mask1, pred, kps1,
                         radius, pts_p, key, *, threshold):
    """Guided local-map matching + masked PnP as ONE device program with
    ONE packed result vector — the intermediate match fetch was a full
    tunnel round trip (~26 ms) per frame."""
    from tadataka_tpu.features.matching import match_descriptors_guided
    from tadataka_tpu.pose_estimation.pnp import solve_pnp_ransac

    matches = match_descriptors_guided(descs_p, descs1, mask_p, mask1,
                                       pred, kps1, radius)
    obj = pts_p[matches.indices[:, 0]]
    img = kps1[matches.indices[:, 1]]
    pose, inliers = solve_pnp_ransac(obj, img, matches.mask, key,
                                     reprojection_threshold=threshold)
    return jnp.concatenate([
        pose.R.ravel(), pose.t,
        jnp.sum(inliers).astype(jnp.float32)[None],
        jnp.sum(matches.mask).astype(jnp.float32)[None],
        matches.indices.ravel().astype(jnp.float32),
        matches.mask.astype(jnp.float32)])


def _fetch_pnp(packed_dev):
    """Fetch solve_pnp_packed's (13,) vector in ONE round trip; raises
    when the RANSAC consensus came back empty."""
    flat = np.asarray(packed_dev)
    if flat[12] < 1.0:
        raise NotEnoughInliersException("No inliers found")
    return Pose(flat[:9].reshape(3, 3), flat[9:12])


_pairwise_tri = jax.jit(pairwise_triangulation)


def _triangulate(pose0, pose1, keypoints0, keypoints1):
    """Two-view triangulation padded to a power-of-two batch so the
    jitted SVD program compiles per capacity bucket, not per count."""
    n = len(keypoints0)
    cap = pow2_cap(n)
    kp0 = pad_rows(np.asarray(keypoints0, np.float32), cap, 0.0)
    kp1 = pad_rows(np.asarray(keypoints1, np.float32), cap, 1e-3)
    points, depths = two_view_triangulation(pose0, pose1,
                                            jnp.asarray(kp0),
                                            jnp.asarray(kp1))
    mask = np.asarray(compute_depth_mask(depths))[:n]
    return np.asarray(points)[:n], mask


class FeatureBasedVO:
    def __init__(self, matcher=None, window_size=8, min_matches=60,
                 max_keypoints=512, patch_size=64,
                 fast_threshold=50.0 / 255.0, guided_radius=0.02,
                 pnp_threshold=None):
        self.matcher = matcher if matcher is not None else Matcher()
        self.window_size = window_size
        self.min_matches = min_matches
        self.max_keypoints = max_keypoints
        self.patch_size = patch_size
        self.fast_threshold = fast_threshold
        # None -> the reference's adaptive gate 3*rms/n (pose.py:67-74).
        # Guided matching keeps the association count healthy enough for
        # the adaptive gate to win; the benchmark configuration
        # (fast_threshold 20/255, max_keypoints 1024, min_matches 40)
        # lands at ATE ~0.08 cm on the 5-frame NewTsukuba clip —
        # regression-gated at 0.13 cm by tests/realdata.
        self.pnp_threshold = pnp_threshold
        # guided local-map tracking: spatial search window (normalized
        # coords) for re-associating map points after the first PnP;
        # None disables (reference behavior: global matching only)
        self.guided_radius = guided_radius

        self.active_viewpoints = []
        self.poses = {}           # viewpoint -> Pose (world->camera, local)
        self.features = {}        # viewpoint -> Features (normalized kps)
        self.raw_keypoints = {}   # viewpoint -> (K, 2) pixel keypoints
        # host copies fetched ONCE per frame: through a remote-dispatch
        # TPU tunnel every np.asarray of a device array is a ~30 ms round
        # trip, so device values the host bookkeeping indexes repeatedly
        # (keypoints, descriptors) are cached as numpy at extraction time
        self._kp_np = {}          # viewpoint -> (K, 2) np normalized kps
        self._desc_np = {}        # viewpoint -> (K, D) np descriptors
        self._current_kp_np = None
        # correspondence: viewpoint -> {keypoint_index: point_id}
        self.correspondences = {}
        self.point_dict = {}      # point_id -> (3,) np.ndarray
        self.point_colors = {}    # point_id -> color
        self._next_point_id = 0
        # frame-ahead extraction: detection+descriptors need only the
        # image, so the next frame's extract (1 dispatch + a ~26 ms fetch
        # round trip) can run on a worker thread while the host processes
        # the current frame
        self._extract_pool = ThreadPoolExecutor(max_workers=1)
        self._extract_futures = {}

    # ------------------------------------------------------------------ api

    def prefetch(self, frame):
        """Start frame's feature extraction on the worker thread; the
        later ``estimate(frame)`` call picks up the result."""
        self._extract_futures[id(frame)] = self._extract_pool.submit(
            self._extract, frame.camera_model, np.asarray(frame.image))

    def estimate(self, frame):
        """Process a frame; returns the camera->world Pose or None."""
        fut = self._extract_futures.pop(id(frame), None)
        viewpoint = self.add(frame.camera_model, frame.image,
                             extracted=(fut.result() if fut else None))
        if viewpoint < 0:
            return None
        self.try_remove()
        return self.poses[viewpoint].inv()

    def export_points(self):
        ids = sorted(self.point_dict.keys())
        points = np.array([self.point_dict[i] for i in ids]) \
            if ids else np.empty((0, 3))
        colors = np.array([self.point_colors.get(i, 0.0) for i in ids])
        return points, colors

    def export_poses(self):
        return [self.poses[v] for v in sorted(self.poses.keys())]

    @property
    def n_active_keyframes(self):
        return len(self.active_viewpoints)

    # ------------------------------------------------------------ internals

    def _new_point_ids(self, n):
        ids = list(range(self._next_point_id, self._next_point_id + n))
        self._next_point_id += n
        return ids

    def _extract(self, camera_model, image):
        # the reference detects on grayscale (feature/feature.py:68)
        if np.asarray(image).ndim == 3:
            from tadataka_tpu.dataset.image_io import rgb2gray
            image = rgb2gray(np.asarray(image))
        feats, normalized_dev, packed_dev = _extract_packed(
            jnp.asarray(image), camera_model,
            self.max_keypoints, self.fast_threshold, self.patch_size)
        # ONE device fetch for everything the host indexes this frame
        packed = np.asarray(packed_dev)
        keypoints_px = packed[:, :2]
        normalized = packed[:, 2:4]
        n_valid = int(packed[:, 4].sum())
        return feats, keypoints_px, normalized, normalized_dev, n_valid

    def _match(self, features1, viewpoints):
        """Compacted (n, 2) match index arrays per viewpoint with enough
        inliers (filter_matches semantics, feature_based.py:74-82).

        All per-viewpoint matcher programs are dispatched first and their
        results stacked on device — TWO host fetches total instead of two
        per viewpoint."""
        indices_dev, masks_dev = self.matcher.match_many(
            [self.features[v] for v in viewpoints], features1)
        V, K = masks_dev.shape
        packed = np.asarray(jnp.concatenate(
            [indices_dev.reshape(V, -1), masks_dev.astype(jnp.int32)],
            axis=1, dtype=jnp.int32))
        indices = packed[:, :2 * K].reshape(V, K, 2)
        masks = packed[:, 2 * K:].astype(bool)
        pairs = []
        kept_viewpoints = []
        for v, mask, idx in zip(viewpoints, masks, indices):
            sel = idx[mask.astype(bool)]
            if len(sel) >= self.min_matches:
                pairs.append(sel)
                kept_viewpoints.append(v)
        if not pairs:
            raise NotEnoughInliersException("Not enough matches found")
        return pairs, kept_viewpoints

    def _normalized_keypoints(self, viewpoint):
        return self._kp_np[viewpoint]

    def add(self, camera_model, image, min_keypoints=8, extracted=None):
        image = np.asarray(image)
        feats, keypoints_px, normalized, normalized_dev, n_valid = \
            extracted if extracted is not None \
            else self._extract(camera_model, image)
        if n_valid <= min_keypoints:
            print_error("Keypoints not sufficient")
            return -1

        # store normalized keypoints in the Features slot (the matcher uses
        # descriptors+mask; geometry uses normalized coords)
        features1 = feats._replace(keypoints=normalized_dev)
        self._current_kp_np = normalized

        viewpoint1 = (self.active_viewpoints[-1] + 1
                      if self.active_viewpoints else 0)

        if not self.active_viewpoints:
            pose1 = Pose.identity()
            self.correspondences[viewpoint1] = {}
            new_points = {}
        else:
            try:
                pose1, new_points, corr_updates, correspondence1 = \
                    self._estimate_pose_points(features1)
            except NotEnoughInliersException as e:
                print_error(e.message)
                return -1
            for v, upd in corr_updates.items():
                self.correspondences[v].update(upd)
            self.correspondences[viewpoint1] = correspondence1

        self.poses[viewpoint1] = pose1
        self.point_dict.update(new_points)
        # colors from the raw image at the keypoint pixel
        corr1 = self.correspondences[viewpoint1]
        for kp_idx, pid in corr1.items():
            if pid in new_points:
                x, y = keypoints_px[kp_idx].astype(int)
                y = min(max(y, 0), image.shape[0] - 1)
                x = min(max(x, 0), image.shape[1] - 1)
                self.point_colors[pid] = image[y, x]

        self.features[viewpoint1] = features1
        self.raw_keypoints[viewpoint1] = keypoints_px
        self._kp_np[viewpoint1] = normalized
        self._desc_np[viewpoint1] = None      # fetched lazily if needed
        self.active_viewpoints.append(viewpoint1)

        if len(self.active_viewpoints) >= 3:
            self.run_ba(self.active_viewpoints)
        return viewpoint1

    def _estimate_pose_points(self, features1):
        if len(self.active_viewpoints) == 1:
            return self._init_first_two(features1, self.active_viewpoints[0])

        pairs, viewpoints = self._match(features1, self.active_viewpoints)
        pose1 = self._solve_pnp(features1, viewpoints, pairs)
        guided_assoc = {}
        if self.guided_radius is not None:
            pose1, guided_assoc = self._guided_localize(features1, pose1)
        pose1, new_points, corr_updates, correspondence1 = \
            self._triangulate_new(viewpoints, pairs, pose1, features1)
        # absorb guided associations that don't conflict with triangulation
        used_pids = set(correspondence1.values())
        for i1, pid in guided_assoc.items():
            if i1 not in correspondence1 and pid not in used_pids:
                correspondence1[i1] = pid
                used_pids.add(pid)
        return pose1, new_points, corr_updates, correspondence1

    def _init_first_two(self, features1, viewpoint0):
        pose0 = self.poses[viewpoint0]
        features0 = self.features[viewpoint0]
        pairs, _ = self._match(features1, [viewpoint0])
        matches01 = pairs[0]

        kp0 = self._kp_np[viewpoint0][matches01[:, 0]]
        kp1 = self._current_kp_np[matches01[:, 1]]

        pose1 = estimate_pose_change(jnp.asarray(kp0), jnp.asarray(kp1))
        pose1 = _fetch_pose(pose1)
        points, mask = _triangulate(pose0, pose1, kp0, kp1)

        # two-view BA refinement: the least-squares essential estimate is
        # noisy at small parallax; a few LM iterations on reprojection error
        # tighten both the relative pose and the bootstrap map.  The gauge
        # (pose0 = identity, |t1| = 1) is restored afterwards.
        pose1, points = self._refine_two_view(
            kp0[mask], kp1[mask], pose1, points[mask])

        ids = self._new_point_ids(int(mask.sum()))
        new_points = {}
        corr0, corr1 = {}, {}
        for pid, (i0, i1), pt in zip(ids, matches01[mask], points):
            new_points[pid] = pt
            corr0[int(i0)] = pid
            corr1[int(i1)] = pid
        return pose1, new_points, {viewpoint0: corr0}, corr1

    def _refine_two_view(self, kp0, kp1, pose1, points):
        from tadataka_tpu.ba.schur import lm_solve
        from tadataka_tpu.core.so3 import log_so3, exp_so3
        n = len(points)
        if n < 12:
            return pose1, points
        cap = pow2_cap(n)
        vi = pad_rows(np.concatenate([np.zeros(n, np.int32),
                                      np.ones(n, np.int32)]), 2 * cap, 0)
        pi_ = pad_rows(np.concatenate([np.arange(n), np.arange(n)])
                       .astype(np.int32), 2 * cap, 0)
        x_true = pad_rows(np.concatenate([kp0, kp1]).astype(np.float32),
                          2 * cap, 0.0)
        weights = pad_rows(np.ones(2 * n, np.float32), 2 * cap, 0.0)
        pts = pad_rows(np.asarray(points, np.float32), cap, 1.0)
        pose_params = jnp.stack([
            jnp.zeros(6),
            jnp.concatenate([log_so3(jnp.asarray(pose1.R)),
                             jnp.asarray(pose1.t)])]).astype(jnp.float32)
        new_params, new_points, _ = lm_solve(
            pose_params, jnp.asarray(pts),
            jnp.asarray(vi), jnp.asarray(pi_), jnp.asarray(x_true),
            weights=jnp.asarray(weights),
            max_iter=10, relative_error_threshold=1e-4)
        new_points = new_points[:n]
        # re-gauge: world = camera-0 frame, unit baseline
        R0 = np.asarray(exp_so3(new_params[0, :3]))
        t0 = np.asarray(new_params[0, 3:])
        R1 = np.asarray(exp_so3(new_params[1, :3]))
        t1 = np.asarray(new_params[1, 3:])
        R_rel = R1 @ R0.T
        t_rel = t1 - R_rel @ t0
        s = np.linalg.norm(t_rel)
        if s < 1e-9 or not np.isfinite(s):
            return pose1, points
        pts = (np.asarray(new_points) @ R0.T + t0) / s
        return Pose(R_rel, t_rel / s), pts

    def _guided_localize(self, features1, pose1):
        """Local-map tracking: project all window map points through the
        PnP pose, re-associate them by spatially-gated descriptor matching
        (features/matching.py::match_descriptors_guided), and re-solve PnP
        on the denser set.  An accuracy upgrade over the reference's
        global-matching-only localization — returns (pose, {kp1: pid}).
        """
        # each map point's descriptor from its most recent observation;
        # descriptors stay ON DEVICE (they are already there) — only the
        # (viewpoint, keypoint) index pairs are uploaded and the (P, D)
        # selection is a device gather, instead of re-uploading ~2 MB of
        # descriptor rows every frame through the tunnel
        window = [v for v in self.active_viewpoints if v in self.features]
        v_pos = {v: i for i, v in enumerate(window)}
        pids, pts, sel = [], [], []
        seen = set()
        for v in reversed(window):
            for kp_idx, pid in self.correspondences[v].items():
                if pid in seen or pid not in self.point_dict:
                    continue
                seen.add(pid)
                pids.append(pid)
                pts.append(self.point_dict[pid])
                sel.append((v_pos[v], kp_idx))
        if len(pids) < 6:
            return pose1, {}

        pts = np.asarray(pts, np.float32)
        # pad to power-of-two capacity so jit shapes stay stable
        cap = 1 << int(np.ceil(np.log2(max(len(pids), 16))))
        pad = cap - len(pids)
        mask = np.concatenate([np.ones(len(pids), bool), np.zeros(pad, bool)])
        pts_p = np.concatenate([pts, np.ones((pad, 3), np.float32)])
        sel_p = np.concatenate(
            [np.asarray(sel, np.int32),
             np.zeros((pad, 2), np.int32)])
        descs_stack = jnp.stack([self.features[v].descriptors
                                 for v in window])
        descs_p = descs_stack[jnp.asarray(sel_p[:, 0]),
                              jnp.asarray(sel_p[:, 1])]

        P = pts_p @ np.asarray(pose1.R).T + np.asarray(pose1.t)
        in_front = P[:, 2] > 1e-6
        pred = P[:, :2] / np.maximum(P[:, 2:3], 1e-16)   # host-side pi

        packed = np.asarray(_guided_match_pnp_fn(
            descs_p, features1.descriptors,
            jnp.asarray(mask & in_front), features1.mask,
            jnp.asarray(pred), features1.keypoints,
            jnp.float32(self.guided_radius),
            jnp.asarray(pts_p), jax.random.PRNGKey(3939),
            threshold=self.pnp_threshold))
        n_inl = packed[12]
        n_matched = packed[13]
        K = cap
        idx = packed[14:14 + 2 * K].reshape(K, 2).astype(np.int64)
        m = packed[14 + 2 * K:].astype(bool)
        if n_matched < 6 or n_inl < 1:
            return pose1, {}
        sel = idx[m]
        assoc = {int(i1): pids[int(i0)] for i0, i1 in sel}
        return Pose(packed[:9].reshape(3, 3), packed[9:12]), assoc

    def _solve_pnp(self, features1, viewpoints, pairs):
        """Localize against already-triangulated points (estime_pose
        [sic] in the reference, feature_based.py:235)."""
        object_points = []
        image_points = []
        for v, matches01 in zip(viewpoints, pairs):
            corr0 = self.correspondences[v]
            for i0, i1 in matches01:
                pid = corr0.get(int(i0))
                if pid is not None:
                    object_points.append(self.point_dict[pid])
                    image_points.append(self._current_kp_np[i1])
        if len(object_points) < 6:
            raise NotEnoughInliersException("No sufficient correspondences")
        # ~2.5 px at typical focal lengths; the adaptive reference formula
        # collapses when hundreds of correspondences are available.
        # Padded to capacity so the RANSAC+GN program compiles per bucket.
        n = len(object_points)
        cap = pow2_cap(n)
        obj = pad_rows(np.asarray(object_points, np.float32), cap, 1.0)
        img = pad_rows(np.asarray(image_points, np.float32), cap, 0.0)
        return _fetch_pnp(solve_pnp_packed(
            obj, img, row_mask(n, cap),
            reprojection_threshold=self.pnp_threshold))

    def _triangulate_new(self, viewpoints, pairs, pose1, features1):
        """Triangulate untriangulated matches, deduplicating keypoints in
        frame 1 (feature_based.py:259-314)."""
        used1 = set()
        used_pids = set()   # one keypoint per point (bidict semantics)
        new_points = {}
        corr_updates = {}
        correspondence1 = {}

        # phase 1: host bookkeeping — which pairs are fresh, per viewpoint
        fresh_by_v = []
        for v, matches01 in zip(viewpoints, pairs):
            corr0 = self.correspondences[v]
            fresh = []
            for i0, i1 in matches01:
                if int(i1) in used1:
                    continue
                pid = corr0.get(int(i0))
                if pid is not None:
                    if pid in used_pids:
                        continue
                    # already triangulated: copy the association
                    used1.add(int(i1))
                    used_pids.add(pid)
                    correspondence1[int(i1)] = pid
                else:
                    used1.add(int(i1))
                    fresh.append((int(i0), int(i1)))
            if fresh:
                fresh_by_v.append((v, np.asarray(fresh)))

        # phase 2: ALL viewpoints' fresh pairs through ONE batched
        # per-row-pose triangulation program and ONE fetch (both a
        # dispatch and a fetch are full tunnel round trips)
        if fresh_by_v:
            segs = []
            R0l, t0l, kp0l, kp1l = [], [], [], []
            for v, fresh in fresh_by_v:
                kp0 = self._kp_np[v][fresh[:, 0]].astype(np.float32)
                kp1 = self._current_kp_np[fresh[:, 1]].astype(np.float32)
                m = len(kp0)
                pv = self.poses[v]
                R0l.append(np.broadcast_to(
                    np.asarray(pv.R, np.float32), (m, 3, 3)))
                t0l.append(np.broadcast_to(
                    np.asarray(pv.t, np.float32), (m, 3)))
                kp0l.append(kp0)
                kp1l.append(kp1)
                segs.append((v, fresh, m))
            R0 = np.concatenate(R0l)
            t0 = np.concatenate(t0l)
            kp0a = np.concatenate(kp0l)
            kp1a = np.concatenate(kp1l)
            n = len(kp0a)
            cap = pow2_cap(n)
            if cap > n:
                R0 = np.concatenate(
                    [R0, np.broadcast_to(np.eye(3, dtype=np.float32),
                                         (cap - n, 3, 3))])
            points_dev, depths_dev = _pairwise_tri(
                jnp.asarray(R0), jnp.asarray(pad_rows(t0, cap, 0.0)),
                jnp.asarray(np.asarray(pose1.R, np.float32)),
                jnp.asarray(np.asarray(pose1.t, np.float32)),
                jnp.asarray(pad_rows(kp0a, cap, 0.0)),
                jnp.asarray(pad_rows(kp1a, cap, 1e-3)))
            flat_np = np.asarray(jnp.concatenate(
                [points_dev.ravel(), depths_dev.ravel()]))
            points_all = flat_np[:3 * cap].reshape(cap, 3)[:n]
            depths_all = flat_np[3 * cap:].reshape(2, cap)[:, :n]
            mask_all = np.all(depths_all > 0.0, axis=0)
            off = 0
            for v, fresh, m in segs:
                mask = mask_all[off:off + m]
                points = points_all[off:off + m]
                off += m
                ids = self._new_point_ids(int(mask.sum()))
                upd0 = {}
                for pid, (i0, i1), pt in zip(ids, fresh[mask],
                                             points[mask]):
                    new_points[pid] = pt
                    upd0[int(i0)] = pid
                    correspondence1[int(i1)] = pid
                corr_updates[v] = upd0

        return pose1, new_points, corr_updates, correspondence1

    def run_ba(self, viewpoints):
        """Windowed BA over active keyframes (feature_based.py:209-233)."""
        point_ids = sorted({pid
                            for v in viewpoints
                            for pid in self.correspondences[v].values()})
        id_to_index = {pid: i for i, pid in enumerate(point_ids)}

        vi, pi_, keypoints = [], [], []
        for j, v in enumerate(viewpoints):
            kps = self._kp_np[v]
            for kp_idx, pid in self.correspondences[v].items():
                vi.append(j)
                pi_.append(id_to_index[pid])
                keypoints.append(kps[kp_idx])

        if not vi:
            return
        poses = [self.poses[v] for v in viewpoints]
        points = np.asarray([self.point_dict[pid] for pid in point_ids],
                            np.float32)
        new_poses, new_points = try_run_ba(
            np.asarray(vi), np.asarray(pi_), poses, points,
            np.asarray(keypoints, np.float32))

        new_points = np.asarray(new_points)
        for pid, pt in zip(point_ids, new_points):
            self.point_dict[pid] = pt
        for v, pose in zip(viewpoints, new_poses):
            self.poses[v] = Pose(np.asarray(pose.R), np.asarray(pose.t))

    def try_remove(self):
        """Evict the oldest keyframe AND free its per-viewpoint state
        (the reference evicts only the viewpoint id,
        feature_based.py:316-321, which leaks on long sequences).
        Poses and the global point map persist for export."""
        if self.n_active_keyframes <= self.window_size:
            return False
        v = self.active_viewpoints.pop(0)
        self.features.pop(v, None)
        self.raw_keypoints.pop(v, None)
        self.correspondences.pop(v, None)
        self._kp_np.pop(v, None)
        self._desc_np.pop(v, None)
        return True
