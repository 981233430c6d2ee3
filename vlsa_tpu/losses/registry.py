"""Loss registry: `load_loss(task, loss_type=[...], **per_loss_kws)` returns a
dict of named loss callables, mirroring ref loss/utils.py:12-76.

Each returned callable has the unified signature used by the runners:
    surv:  fn(pred, t, e, **runtime_kws) -> scalar
    clf:   fn(logits, target) -> scalar
`QueryDiv` maps to None — the VLSA runner binds it to the network-owned
query-diversity regulariser (ref: runner/vlsa_handler.py:181-187).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp

from . import clf as _clf
from . import surv as _surv
from . import surv_ext as _surv_ext


def loss_reg_l1(coef):
    """L1 parameter regulariser factory (ref loss/utils.py:23-30)."""
    coef = 0.0 if coef is None else coef

    def func(model_params):
        if coef <= 1e-8:
            return 0.0
        import jax
        return coef * sum(jnp.abs(w).sum() for w in jax.tree.leaves(model_params))

    return func


def _filter_kws(kws: dict) -> dict:
    return {k: v for k, v in kws.items() if k != "weight"}


_SURV_FUNCS = {
    "SurvMLE": _surv.surv_mle,
    "SurvIFMLE": _surv.surv_ifmle,
    "SurvPLE": _surv.surv_ple,
    "recon_loss": _surv.recon_loss,
    "rank_loss": _surv.rank_loss,
    "MSE_loss": _surv.mse_loss,
    "SurvEMD": _surv_ext.surv_emd,
    "SurvT2I": _surv_ext.surv_t2i,
}

_CLF_FUNCS = {
    "BCE": _clf.binary_cross_entropy,
    "CE": _clf.soft_target_cross_entropy,
    "LabelSmoothingCrossEntropy": _clf.label_smoothing_cross_entropy,
    "SoftTargetCrossEntropy": _clf.soft_target_cross_entropy,
    "BinaryCrossEntropy": _clf.binary_cross_entropy,
}


def load_surv_loss_func(loss_type: str, **loss_cfg):
    if loss_type == "QueryDiv":
        return None
    if loss_type == "CE":
        # cross-entropy over discrete bins for ablation configs
        def ce(pred, t, e, **_):
            logprobs = jnp.log(jnp.maximum(pred, 1e-12))
            t_idx = t.reshape(-1, 1).astype(jnp.int32)
            return -jnp.mean(jnp.take_along_axis(logprobs, t_idx, axis=1))
        return ce
    if loss_type not in _SURV_FUNCS:
        raise ValueError(f"unknown survival loss: {loss_type}")
    fn = _SURV_FUNCS[loss_type]
    cfg = _filter_kws(loss_cfg)
    return functools.partial(fn, **cfg) if cfg else fn


def load_clf_loss_func(loss_type: str, **loss_cfg):
    if loss_type == "BCE":
        return functools.partial(
            _clf.binary_cross_entropy,
            smoothing=loss_cfg.get("smoothing", 0.1),
            target_threshold=loss_cfg.get("target_thresh"),
        )
    if loss_type == "CE":
        return functools.partial(
            _clf.soft_target_cross_entropy, smoothing=loss_cfg.get("smoothing", 0.1)
        )
    if loss_type not in _CLF_FUNCS:
        raise ValueError(f"unknown clf loss: {loss_type}")
    cfg = _filter_kws(loss_cfg)
    fn = _CLF_FUNCS[loss_type]
    return functools.partial(fn, **cfg) if cfg else fn


def load_loss(task: str, **kws):
    """Build `{loss_name: fn}` from `loss_type` list (ref loss/utils.py:12-21)."""
    if task not in ("clf", "sa", "vlsa"):
        raise NotImplementedError(f"cannot recognize the task {task}.")
    assert "loss_type" in kws, "The key `loss_type` is not found in kws."
    loader = load_clf_loss_func if task == "clf" else load_surv_loss_func
    loss_fn = {}
    for loss_name in kws["loss_type"]:
        loss_fn[loss_name] = loader(loss_name, **kws.get(loss_name, {}))
    return loss_fn
