from .shapley import evaluate_prototype_shap_imp, shapley_values  # noqa: F401
from .similarity import (  # noqa: F401
    calc_abmil_text_img_similarity,
    calc_text_img_similarity,
)
from .loader import get_model_cfg, load_vlsa_from_run  # noqa: F401
