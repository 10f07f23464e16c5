"""Multi-chip semi-dense depth update: pixel rows sharded across devices.

The per-pixel inverse-depth update is embarrassingly parallel (the reference
walks it serially, semi_dense.rs:186-228); on a mesh each device owns H/n
pixel rows of the prior/age maps while the (small) key/ref images replicate.

Design: an explicit ``shard_map`` rather than device_put + GSPMD inference —
each device runs ``update_depth`` on its local row block (with the block's
global row offset), so the compiled per-device program provably contains no
collectives; there is nothing for the partitioner to guess.
"""

from functools import partial

import jax
from jax.sharding import PartitionSpec as P

from tadataka_tpu.vo.semi_dense.estimator import update_depth
from tadataka_tpu.vo.semi_dense.params import DEFAULT_N_REF_SAMPLES

def _local_update(keyframe, refframes, age_map, prior_depth, prior_variance,
                  params, n_ref_samples, rows_per_device, axis):
    offset = jax.lax.axis_index(axis) * rows_per_device
    return update_depth(keyframe, refframes, age_map, prior_depth,
                        prior_variance, params,
                        n_ref_samples=n_ref_samples, row_offset=offset)


def sharded_update_depth(mesh, keyframe, refframes, age_map, prior_depth,
                         prior_variance, params,
                         n_ref_samples=DEFAULT_N_REF_SAMPLES):
    """update_depth with the pixel grid row-sharded over ``mesh``.

    Requires H to divide evenly by the mesh size (pad rows otherwise).
    Returns (depth_map, variance_map, flag_map), row-sharded.
    """
    f = make_sharded_update_depth(mesh, prior_depth.shape,
                                  n_ref_samples=n_ref_samples)
    return f(keyframe, refframes, age_map, prior_depth, prior_variance,
             params)


def make_sharded_update_depth(mesh, shape, n_ref_samples=DEFAULT_N_REF_SAMPLES):
    """Build the jitted row-sharded update for a (H, W) map shape."""
    n = mesh.devices.size
    axis = mesh.axis_names[0]
    H, _W = shape
    if H % n != 0:
        raise ValueError(f"H={H} must divide by the mesh size {n}")
    local = partial(_local_update, n_ref_samples=n_ref_samples,
                    rows_per_device=H // n, axis=axis)
    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    ))
