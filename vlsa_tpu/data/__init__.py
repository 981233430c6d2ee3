from .label_converter import (  # noqa: F401
    MetaSurvData,
    calculate_discrete_time_bins,
    calculate_uncensored_time_bins,
)
from .splits import read_file_data_splitting  # noqa: F401
from .io import (  # noqa: F401
    read_patch_data,
    load_init_prompt,
    load_init_text,
    save_prediction_surv,
    save_prediction_clf,
)
from .bags import SurvBagDataset, FewShotSurvBagDataset, prepare_surv_dataset  # noqa: F401
from .pipeline import BagBatcher, pad_bag  # noqa: F401
from .extract import (  # noqa: F401  (jax is imported lazily inside)
    FeatureExtractor,
    extract_to_store,
    list_tile_sources,
    read_tiles,
    write_feature_store,
)
from .transforms import preprocess_batch, preprocess_tile  # noqa: F401
