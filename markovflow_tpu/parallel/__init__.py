from .sharding import Mesh, NamedSharding, P, make_mesh, shard_batched_series
