"""Semi-dense VO pipeline: DVO tracking + semi-dense depth mapping.

Parity surface: /root/reference/examples/semi_dense_vo.py:152-207 (the
flagship loop): per frame — pose by DVO against the previous depth map
(bootstrap by feature-based essential estimation), age increment, depth/
variance propagation, full-map epipolar depth update, refframe history.

Library-class form; the reference's hard process-exit on age/history
mismatch (semi_dense.rs:203-205) becomes an age clamp.
"""

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from tadataka_tpu.camera import CameraParameters
from tadataka_tpu.core.pose import Pose
from tadataka_tpu.core.transforms import inv_motion_matrix
from tadataka_tpu.dataset.image_io import rgb2gray
from tadataka_tpu.vo.dvo import PoseChangeEstimator
from tadataka_tpu.vo.semi_dense import (
    SemiDenseParams, make_frame, update_depth, propagate, increment_age,
    regularize)
from tadataka_tpu.vo.semi_dense.estimator import safe_invert
from tadataka_tpu.vo.semi_dense.frame import stack_frames


class SemiDenseVOState(NamedTuple):
    pose_wc: Pose          # camera -> world of the latest frame
    depth_map: jnp.ndarray
    variance_map: jnp.ndarray
    age_map: jnp.ndarray
    flag_map: Optional[jnp.ndarray]


class SemiDenseVO:
    def __init__(self, camera_params: CameraParameters,
                 params: SemiDenseParams = None,
                 default_depth=200.0, default_variance=100.0,
                 uncertainty_bias=1.0, depth_range=(60.0, 1000.0),
                 history_size=8, n_ref_samples=64,
                 n_coarse_to_fine=5, regularize_depth=True,
                 initial_pose_fn=None, seed=0):
        """``initial_pose_fn(image0, image1) -> Pose`` optionally supplies
        the scale-ambiguous bootstrap pose for the second frame (the
        reference uses feature matching + essential estimation with a
        manual scale, examples/semi_dense_vo.py:124-127)."""
        self.camera_params = camera_params
        self.params = params or SemiDenseParams.create(
            depth_range[0], depth_range[1],
            geo_coeff=0.01, photo_coeff=0.01,
            ref_step_size=0.01, min_gradient=0.2)
        self.depth_range = depth_range
        self.default_depth = default_depth
        self.default_variance = default_variance
        self.uncertainty_bias = uncertainty_bias
        self.history_size = history_size
        self.n_ref_samples = n_ref_samples
        self.n_coarse_to_fine = n_coarse_to_fine
        self.regularize_depth = regularize_depth
        self.initial_pose_fn = initial_pose_fn
        self.seed = seed

        from tadataka_tpu.camera import CameraModel
        cm = CameraModel.create(camera_params)
        self.dvo = PoseChangeEstimator(cm, cm,
                                       n_coarse_to_fine=n_coarse_to_fine)

        self.refframes = []
        self.state: Optional[SemiDenseVOState] = None
        self._prev_image = None

    def estimate(self, frame):
        """Process a frame (Frame or raw image).  Returns the state."""
        image = frame.image if hasattr(frame, "image") else frame
        image = jnp.asarray(rgb2gray(np.asarray(image)), dtype=jnp.float32)

        if self.state is None:
            return self._initialize(image)

        H, W = image.shape
        prev = self.state

        # 1. pose tracking against the previous frame's depth map
        weights = safe_invert(prev.variance_map)
        if len(self.refframes) == 1 and self.initial_pose_fn is not None:
            pose10 = self.initial_pose_fn(self._prev_image, image)
        else:
            pose10 = self.dvo(self._prev_image, prev.depth_map, image,
                              weights=np.asarray(weights))
        T10 = pose10.T
        pose_wc = Pose.from_matrix(
            np.asarray(prev.pose_wc.T) @ np.asarray(inv_motion_matrix(T10)))

        # 2. propagate age and hypotheses into the new frame
        age1 = increment_age(prev.age_map, self.camera_params,
                             self.camera_params, T10, prev.depth_map)
        depth1, variance1 = propagate(
            T10, self.camera_params, self.camera_params,
            prev.depth_map, prev.variance_map,
            self.default_depth, self.default_variance,
            self.uncertainty_bias)

        # 3. epipolar depth update against the age-selected refframes
        keyframe = make_frame(self.camera_params, image, pose_wc.T)
        refs = stack_frames(self.refframes[-self.history_size:])
        age_clamped = jnp.clip(age1, 0, refs.image.shape[0])
        depth1, variance1, flags = update_depth(
            keyframe, refs, age_clamped, depth1, variance1, self.params,
            n_ref_samples=self.n_ref_samples)

        if self.regularize_depth:
            depth1 = regularize(depth1, variance1, flags)

        self._push_refframe(keyframe)
        self.state = SemiDenseVOState(pose_wc, depth1, variance1,
                                      age1, flags)
        self._prev_image = image
        return self.state

    def _initialize(self, image):
        H, W = image.shape
        rng = np.random.default_rng(self.seed)
        depth = jnp.asarray(
            rng.uniform(*self.depth_range, (H, W)).astype(np.float32))
        variance = self.default_variance * jnp.ones((H, W))
        age = jnp.zeros((H, W), dtype=jnp.int32)
        pose_wc = Pose.identity()
        keyframe = make_frame(self.camera_params, image, pose_wc.T)
        self._push_refframe(keyframe)
        self.state = SemiDenseVOState(pose_wc, depth, variance, age, None)
        self._prev_image = image
        return self.state

    def _push_refframe(self, keyframe):
        self.refframes.append(keyframe)
        if len(self.refframes) > self.history_size:
            self.refframes.pop(0)
