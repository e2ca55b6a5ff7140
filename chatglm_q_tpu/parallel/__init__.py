from .sharding import make_mesh, param_pspecs, shard_params, kv_cache_pspecs
from .pipeline import pp_forward, pipeline_blocks, shard_layers
