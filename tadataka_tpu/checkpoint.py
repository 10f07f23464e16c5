"""Checkpoint / resume for pipeline state.

The reference has no algorithm-state persistence (SURVEY.md §5); here any
JAX pytree (SemiDenseVO state, keyframe windows, BA problems) serializes to
a single .npz: leaves as arrays, the tree structure as JSON.
"""

import json

import numpy as np
import jax


def _encode_path(path):
    return "/".join(str(k) for k in path)


def save_pytree(path, tree):
    """Save any pytree of arrays/scalars to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_pytree(path, like):
    """Load arrays saved by ``save_pytree`` into the structure of ``like``.

    ``like`` supplies the tree structure (and device placement is left to
    the caller); leaf VALUES come from the checkpoint.
    """
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    for i, (a, b) in enumerate(zip(leaves, leaves_like)):
        if hasattr(b, "shape") and tuple(a.shape) != tuple(
                np.asarray(b).shape):
            raise ValueError(
                f"leaf {i}: checkpoint shape {a.shape} != "
                f"expected {np.asarray(b).shape}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_trajectory_tum(path, timestamps, poses):
    """Poses (camera->world) to TUM format (tum.py:19-29 equivalent)."""
    from scipy.spatial.transform import Rotation
    from tadataka_tpu.dataset.tum import save_in_tum_format
    rotations = Rotation.from_matrix(
        np.stack([np.asarray(p.R) for p in poses]))
    positions = np.stack([np.asarray(p.t) for p in poses])
    save_in_tum_format(path, timestamps, rotations, positions)
