from .sharding import (  # noqa: F401
    make_mesh,
    batch_pspec,
    param_shardings,
    shard_params,
)
