"""Semi-dense estimator parameters.

Parity surface: /root/reference/src/semi_dense/params.rs (inv_depth_range,
variance coefficients, ref_step_size, min_gradient) with the example values
from /root/reference/examples/semi_dense_vo.py:31-42 as defaults.  The
static ``n_ref_samples`` bounds the epipolar search length — the price of
static shapes — and is generous relative to the +-2 sigma prior range the
search actually spans.
"""

from typing import NamedTuple

import jax.numpy as jnp


class SemiDenseParams(NamedTuple):
    min_inv_depth: jnp.ndarray
    max_inv_depth: jnp.ndarray
    geo_coeff: jnp.ndarray
    photo_coeff: jnp.ndarray
    ref_step_size: jnp.ndarray
    min_gradient: jnp.ndarray

    @classmethod
    def create(cls, min_depth, max_depth, geo_coeff=0.01, photo_coeff=0.01,
               ref_step_size=0.01, min_gradient=0.2, dtype=jnp.float32):
        as_arr = lambda v: jnp.asarray(v, dtype=dtype)
        return cls(
            min_inv_depth=as_arr(1.0 / max_depth),
            max_inv_depth=as_arr(1.0 / min_depth),
            geo_coeff=as_arr(geo_coeff),
            photo_coeff=as_arr(photo_coeff),
            ref_step_size=as_arr(ref_step_size),
            min_gradient=as_arr(min_gradient),
        )


# static (non-traced) kernel configuration
N_KEY_SAMPLES = 5          # key patch: steps -2..2 (epipolar.rs:22)
DEFAULT_N_REF_SAMPLES = 64  # static cap of the epipolar search length
