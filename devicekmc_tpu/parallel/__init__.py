from .mesh import make_mesh
from .sharding import shard_simulation, make_sharded_superstep

__all__ = ["make_mesh", "shard_simulation", "make_sharded_superstep"]
