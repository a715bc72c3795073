from .sharding import make_mesh, shard_operator, shard_rhs, solve_sharded
from .multihost import (
    init_distributed,
    make_pod_mesh,
    global_array,
    distribute_problem,
)
