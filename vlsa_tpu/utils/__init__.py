from .torch_import import (  # noqa: F401
    import_text_tower_state,
    import_vlsa_learnable_state,
    load_torch_state_dict,
)
from .seed import seed_everything  # noqa: F401
from .observability import JsonlLogger, configure_debug, maybe_profile  # noqa: F401
