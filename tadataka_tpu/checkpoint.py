"""Checkpoint / resume for pipeline state.

The reference has no algorithm-state persistence (SURVEY.md §5); here any
JAX pytree (SemiDenseVO state, keyframe windows, BA problems) serializes to
a single .npz: leaves as arrays, the tree structure as JSON.
"""

import json

import numpy as np
import jax


def _path_key(entry):
    """One path entry -> a JSON-stable key."""
    if isinstance(entry, jax.tree_util.DictKey):
        return str(entry.key)
    if isinstance(entry, jax.tree_util.SequenceKey):
        return entry.idx
    if isinstance(entry, jax.tree_util.GetAttrKey):
        return str(entry.name)
    if isinstance(entry, jax.tree_util.FlattenedIndexKey):
        return entry.key
    return str(entry)


def save_pytree(path, tree):
    """Save any pytree of arrays/scalars to ``path`` (.npz).

    Alongside the leaves, the key path of every leaf is stored so the
    checkpoint is self-describing: ``load_pytree`` can rebuild a nested
    dict/list skeleton with no template.
    """
    flat, _treedef = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, (_, leaf) in
              enumerate(flat)}
    paths = [[_path_key(k) for k in p] for p, _ in flat]
    arrays["__paths__"] = np.frombuffer(
        json.dumps(paths).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def _skeleton_from_paths(paths, leaves):
    """Nested dicts (str keys) / lists (int keys) holding the leaves."""
    root = {}
    for keys, leaf in zip(paths, leaves):
        if not keys:
            return leaf                     # the tree is a single leaf
        node = root
        for k, nxt in zip(keys[:-1], keys[1:]):
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf

    def listify(node):
        if not isinstance(node, dict):
            return node
        vals = {k: listify(v) for k, v in node.items()}
        if vals and all(isinstance(k, int) for k in vals):
            return [vals[i] for i in sorted(vals)]
        return vals

    return listify(root)


def load_pytree(path, like=None):
    """Restore a pytree saved by ``save_pytree``.

    With ``like`` (a template tree), leaves load into its exact structure —
    required to get custom node types (NamedTuples, dataclasses) back.
    Without it, the stored key paths rebuild a plain nested dict/list
    skeleton carrying the same leaves in the same places.
    """
    data = np.load(path)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    leaves = [data[f"leaf_{i}"] for i in range(n)]

    if like is None:
        paths = json.loads(bytes(data["__paths__"]).decode())
        return _skeleton_from_paths(paths, leaves)

    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    if len(leaves_like) != n:
        raise ValueError(f"checkpoint has {n} leaves; template has "
                         f"{len(leaves_like)}")
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
