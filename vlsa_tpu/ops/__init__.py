from .masked import (  # noqa: F401
    masked_softmax,
    masked_mean,
    masked_max,
    masked_topk_mean,
    l2_normalize,
)
from .coattn import coattn_pool, coattn_pool_reference  # noqa: F401
