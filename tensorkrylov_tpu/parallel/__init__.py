from .sharding import make_mesh, shard_operator, shard_rhs, solve_sharded
