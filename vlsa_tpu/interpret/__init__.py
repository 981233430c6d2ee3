from .shapley import evaluate_prototype_shap_imp, shapley_values  # noqa: F401
from .similarity import calc_text_img_similarity  # noqa: F401
