"""Bundle-adjustment reprojection residuals and Jacobians.

Parity surface: /root/reference/tadataka/transform_project.pyx and
/root/reference/tadataka/so3_codegen.py — project(exp(omega) p + t) and its
analytic 2x6 pose / 2x3 point Jacobians, generated there by sympy at build
time.  Here the same Jacobians fall out of ``jax.jacfwd`` at trace time and
fuse into the surrounding XLA program; the whole codegen subsystem
disappears.
"""

import jax
import jax.numpy as jnp

from tadataka_tpu.core.so3 import exp_so3
from tadataka_tpu.core.projection import pi


def transform_project(pose_params, point):
    """pose_params = [omega (3), t (3)]; point (3,) -> projected (2,)."""
    omega, t = pose_params[:3], pose_params[3:]
    p = exp_so3(omega) @ point + t
    return pi(p)


pose_jacobian = jax.jacfwd(transform_project, argnums=0)
point_jacobian = jax.jacfwd(transform_project, argnums=1)


def projection_residuals(poses, points, viewpoint_indices, point_indices,
                         x_true):
    """Batched residuals r_o = x_true_o - project(pose_j(o), point_i(o)).

    poses: (M, 6), points: (N, 3); indices (O,).  Returns (O, 2).
    """
    pose_o = poses[viewpoint_indices]
    point_o = points[point_indices]
    x_pred = jax.vmap(transform_project)(pose_o, point_o)
    return x_true - x_pred


def projection_jacobians(poses, points, viewpoint_indices, point_indices):
    """(A, B): per-observation 2x6 pose and 2x3 point Jacobians."""
    pose_o = poses[viewpoint_indices]
    point_o = points[point_indices]
    A = jax.vmap(pose_jacobian)(pose_o, point_o)
    B = jax.vmap(point_jacobian)(pose_o, point_o)
    return A, B
