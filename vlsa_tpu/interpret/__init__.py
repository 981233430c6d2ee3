from .shapley import evaluate_prototype_shap_imp, shapley_values  # noqa: F401
from .similarity import calc_text_img_similarity  # noqa: F401
from .loader import get_model_cfg, load_vlsa_from_run  # noqa: F401
