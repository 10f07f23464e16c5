"""DVO trajectory estimation over an RGB-D sequence.

Parity surface: /root/reference/examples/dvo_pose_change.py:40-90 — chain
frame-to-frame DVO pose changes into a world trajectory.
"""

import numpy as np
import jax.numpy as jnp

from tadataka_tpu.core.pose import Pose
from tadataka_tpu.dataset.image_io import rgb2gray
from tadataka_tpu.vo.dvo import PoseChangeEstimator


class DvoTrajectory:
    def __init__(self, camera_model, weights="huber",
                 n_coarse_to_fine=5, max_iter=20):
        self.camera_model = camera_model
        self.weights = weights
        self.estimator = PoseChangeEstimator(
            camera_model, camera_model,
            n_coarse_to_fine=n_coarse_to_fine, max_iter=max_iter)
        self.pose_wc = Pose.identity()
        self.trajectory = [self.pose_wc]
        self._prev = None

    def estimate(self, frame):
        """frame: Frame with .image and .depth_map.  Returns pose_wc."""
        image = jnp.asarray(rgb2gray(np.asarray(frame.image)),
                            dtype=jnp.float32)
        depth = jnp.asarray(np.asarray(frame.depth_map), dtype=jnp.float32)
        if self._prev is not None:
            prev_image, prev_depth = self._prev
            pose10 = self.estimator(prev_image, prev_depth, image,
                                    weights=self.weights)
            # pose10: camera0 -> camera1; world pose composes the inverse
            self.pose_wc = self.pose_wc * pose10.inv()
            self.trajectory.append(self.pose_wc)
        self._prev = (image, depth)
        return self.pose_wc

    def positions(self):
        return np.stack([np.asarray(p.t) for p in self.trajectory])
