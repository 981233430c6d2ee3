from .sharding import (  # noqa: F401
    make_mesh,
    batch_pspec,
    param_shardings,
    shard_params,
)
from .multihost import (  # noqa: F401
    make_global_batch,
    maybe_initialize_distributed,
    process_shard_info,
)
