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
