"""Inverse-depth hypothesis validity and search range.

Parity surface: /root/reference/src/semi_dense/hypothesis.rs — range =
inv_depth +- 2*variance clamped to the valid inverse-depth interval;
``check_args`` rejects non-positive priors and ranges that miss the valid
interval.  Returns flags instead of Result.
"""

import jax.numpy as jnp

from tadataka_tpu.flags import Flag

VARIANCE_FACTOR = 2.0


def hypothesis_range(inv_depth, variance):
    lo = inv_depth - VARIANCE_FACTOR * variance
    hi = inv_depth + VARIANCE_FACTOR * variance
    return lo, hi


def clamped_range(inv_depth, variance, min_inv_depth, max_inv_depth):
    lo, hi = hypothesis_range(inv_depth, variance)
    return (jnp.clip(lo, min_inv_depth, max_inv_depth),
            jnp.clip(hi, min_inv_depth, max_inv_depth))


def check_args_flag(inv_depth, variance, min_inv_depth, max_inv_depth):
    """0 if valid, else the failure flag (int32)."""
    lo, hi = hypothesis_range(inv_depth, variance)
    out_of_range = jnp.logical_or(hi <= min_inv_depth, max_inv_depth <= lo)
    flag = jnp.where(out_of_range,
                     jnp.int32(Flag.HYPOTHESIS_OUT_OF_SEARCH_RANGE),
                     jnp.int32(Flag.SUCCESS))
    return jnp.where(inv_depth <= 0.0,
                     jnp.int32(Flag.NEGATIVE_PRIOR_DEPTH), flag)
