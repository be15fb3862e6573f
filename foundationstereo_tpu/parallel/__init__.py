from foundationstereo_tpu.parallel.mesh import make_mesh, mesh_context, current_mesh  # noqa: F401
from foundationstereo_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    replicate,
    shard_batch,
    shard_spatial,
)
