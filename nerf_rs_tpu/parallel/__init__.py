from . import dp, mesh  # noqa: F401
from .mesh import batch_sharding, make_mesh, num_shards, replicated_sharding  # noqa: F401
