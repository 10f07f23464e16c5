from tadataka_tpu.parallel.mesh import make_mesh, default_mesh
from tadataka_tpu.parallel.distributed_ba import (
    distributed_lm_solve, shard_observations)
from tadataka_tpu.parallel.sharded_semi_dense import sharded_update_depth
from tadataka_tpu.parallel.sharded_semi_dense import make_sharded_update_sweep
from tadataka_tpu.parallel.multihost import (
    initialize_distributed, make_host_mesh)
