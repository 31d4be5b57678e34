from .mesh import make_mesh, shard_batch, replicate, batch_sharding  # noqa: F401
from .sharding import shard_disparity  # noqa: F401
