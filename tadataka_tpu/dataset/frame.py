"""Frame record emitted by every dataset.

Parity surface: /root/reference/tadataka/dataset/frame.py:4-12 —
(camera_model, pose, image, depth_map), where pose is camera->world.
"""

from typing import NamedTuple, Any


class Frame(NamedTuple):
    camera_model: Any
    pose: Any       # Pose, camera -> world (pose_wf)
    image: Any      # (H, W) gray or (H, W, 3) rgb
    depth_map: Any  # (H, W) or None
