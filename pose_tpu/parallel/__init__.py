from .mesh import (batch_sharding, init_distributed, is_main_process,
                   make_mesh, replicated_sharding, shard_batch,
                   shard_replicated, spatial_sharding)
