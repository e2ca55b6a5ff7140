from .sharding import make_mesh, param_pspecs, shard_params, kv_cache_pspecs
