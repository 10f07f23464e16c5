"""Pixel age propagation.

Parity surface: /root/reference/src/semi_dense/age.rs — warp each pixel into
the next frame and write age+1; unreached pixels get age 0.  The sequential
last-writer-wins scatter becomes a deterministic scatter-max.
"""

import jax
import jax.numpy as jnp

from tadataka_tpu.core.coordinates import image_coordinates
from tadataka_tpu.core.warp import warp2d


@jax.jit
def increment_age(age_map0, camera_params0, camera_params1, T10, depth_map0):
    H, W = age_map0.shape
    us0 = image_coordinates((H, W))
    us1, depths1 = warp2d(T10, camera_params0, camera_params1,
                          us0, depth_map0.ravel().astype(jnp.float32))

    tx = jnp.round(us1[:, 0]).astype(jnp.int32)
    ty = jnp.round(us1[:, 1]).astype(jnp.int32)
    valid = (0 <= tx) & (tx <= W - 1) & (0 <= ty) & (ty <= H - 1)
    tx = jnp.clip(tx, 0, W - 1)
    ty = jnp.clip(ty, 0, H - 1)
    cell = ty * W + tx

    ages = jnp.where(valid, age_map0.ravel().astype(jnp.int32) + 1, 0)
    age1 = jnp.zeros((H * W,), dtype=jnp.int32).at[cell].max(ages)
    return age1.reshape(H, W)
