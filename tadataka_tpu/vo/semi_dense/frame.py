"""Frame record for the semi-dense pipeline.

Parity surface: /root/reference/src/semi_dense/frame.rs — (camera_params,
gray image, transform_wf).  A stack of these (leading axis R) forms the
reference-frame history; stacking is a pytree map so frames batch trivially.
"""

from typing import NamedTuple

import jax.numpy as jnp

from tadataka_tpu.camera import CameraParameters


class SemiDenseFrame(NamedTuple):
    focal_length: jnp.ndarray   # (2,) or (R, 2)
    offset: jnp.ndarray         # (2,) or (R, 2)
    image: jnp.ndarray          # (H, W) or (R, H, W)
    transform_wf: jnp.ndarray   # (4, 4) or (R, 4, 4)


def make_frame(camera_params: CameraParameters, image, transform_wf):
    return SemiDenseFrame(
        focal_length=jnp.asarray(camera_params.focal_length),
        offset=jnp.asarray(camera_params.offset),
        image=jnp.asarray(image),
        transform_wf=jnp.asarray(transform_wf),
    )


def stack_frames(frames):
    return SemiDenseFrame(
        focal_length=jnp.stack([f.focal_length for f in frames]),
        offset=jnp.stack([f.offset for f in frames]),
        image=jnp.stack([f.image for f in frames]),
        transform_wf=jnp.stack([f.transform_wf for f in frames]),
    )


def normalize(frame, us):
    return (us - frame.offset) / frame.focal_length


def unnormalize(frame, xs):
    return xs * frame.focal_length + frame.offset
