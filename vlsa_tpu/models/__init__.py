from .registry import load_model  # noqa: F401
from .mil import (  # noqa: F401
    VLFAN,
    DeepMIL,
    FeatMIL,
    MaxMIL,
    MeanMIL,
    DSMIL,
    logit_pooling,
)
from .mil_ext import TransMIL, ILRA, DeepAttnMISL, PatchGCN  # noqa: F401
from .vlsa import VLSA  # noqa: F401
from .vision_tower import (  # noqa: F401
    AttentionalPooler,
    CLIPModifiedResNet,
    CLIPViT,
    ConchVisualModel,
    TimmViTTrunk,
)
from .multimodal import MultimodalDecoder, coca_generate  # noqa: F401
