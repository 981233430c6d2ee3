from .registry import load_loss, load_surv_loss_func, load_clf_loss_func, loss_reg_l1  # noqa: F401
from .surv import surv_mle, surv_ifmle, surv_ple, recon_loss, rank_loss, mse_loss  # noqa: F401
from .surv_ext import (  # noqa: F401
    cdf_loss,
    convert_survival_label,
    surv_emd,
    surv_t2i,
    sup_con_loss,
)
