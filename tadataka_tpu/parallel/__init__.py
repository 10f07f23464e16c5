from tadataka_tpu.parallel.mesh import make_mesh, default_mesh
from tadataka_tpu.parallel.distributed_ba import (
    distributed_lm_solve, shard_observations)
from tadataka_tpu.parallel.sharded_semi_dense import sharded_update_depth
