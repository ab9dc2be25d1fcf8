from .mesh import make_mesh  # noqa: F401
from .sharding import (batch_sharding, data_parallel, replicate_to_mesh)  # noqa: F401
