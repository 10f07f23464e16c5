"""Multi-chip semi-dense depth update: pixel rows sharded across devices.

The per-pixel inverse-depth update is embarrassingly parallel (the reference
walks it serially, semi_dense.rs:186-228); on a mesh the pixel grid shards
by rows while the (small) key/ref images replicate.  Zero collectives in the
step itself — pure data parallelism riding XLA's SPMD partitioner.
"""

from functools import partial

import jax

from tadataka_tpu.parallel.mesh import row_sharding, replicated
from tadataka_tpu.vo.semi_dense.estimator import update_depth
from tadataka_tpu.vo.semi_dense.params import DEFAULT_N_REF_SAMPLES


def sharded_update_depth(mesh, keyframe, refframes, age_map, prior_depth,
                         prior_variance, params,
                         n_ref_samples=DEFAULT_N_REF_SAMPLES):
    """update_depth with maps sharded over the mesh's first axis."""
    shard = row_sharding(mesh)
    repl = replicated(mesh)

    place = lambda tree: jax.tree.map(
        lambda x: jax.device_put(x, repl), tree)
    keyframe = place(keyframe)
    refframes = place(refframes)
    params = place(params)
    age_map = jax.device_put(age_map, shard)
    prior_depth = jax.device_put(prior_depth, shard)
    prior_variance = jax.device_put(prior_variance, shard)

    return update_depth(keyframe, refframes, age_map, prior_depth,
                        prior_variance, params, n_ref_samples=n_ref_samples)
