"""Tensor geometry core: SO(3)/SE(3), projection, warping, triangulation.

Pure ``jax.numpy`` — no host math.  Every function is defined on a single
element and batched with ``jax.vmap`` (or is natively batched), so the same
code path serves one keypoint or a full H×W pixel grid.  Jacobians of any of
these maps come from ``jax.jacfwd`` — the reference's sympy→C codegen
subsystem (/root/reference/tadataka/so3_codegen.py) has no equivalent here by
design.
"""

from tadataka_tpu.core.so3 import hat_so3, exp_so3, log_so3
from tadataka_tpu.core.se3 import exp_se3, log_se3, exp_se3_t
from tadataka_tpu.core.pose import Pose
from tadataka_tpu.core.projection import pi, inv_pi
from tadataka_tpu.core.transforms import (
    motion_matrix, get_rotation, get_translation, inv_motion_matrix,
    relative_transform, transform_points, to_homogeneous, from_homogeneous,
)
from tadataka_tpu.core.warp import warp_depth, warp2d, Warp2D, LocalWarp2D, Warp3D
from tadataka_tpu.core.interpolation import interpolate, interpolate_checked
from tadataka_tpu.core.triangulation import (
    calc_depth0, linear_triangulation, two_view_triangulation,
    depths_from_triangulation,
)
from tadataka_tpu.core.image_range import is_in_image_range, all_in_image_range
from tadataka_tpu.core.coordinates import image_coordinates
