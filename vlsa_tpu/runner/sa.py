"""SA handler: vision-only survival models (ABMIL & friends).

Behavioural port of ref runner/sa_handler.py:18-283.
"""
from __future__ import annotations

import numpy as np

from ..config import fetch_kws, parse_str_dims, rename_keys
from ..data import MetaSurvData, prepare_surv_dataset
from ..data.io import save_prediction_surv
from ..eval import load_evaluator
from ..models import load_model
from .base import BaseHandler


def build_surv_meta(cfg, data_split):
    """Shared label pipeline (ref sa_handler.py:44-83 / vlsa_handler.py:43-85)."""
    time_format = cfg["time_format"]
    assert time_format in ("origin", "ratio", "interval", "quantile")
    use_discrete = time_format in ("interval", "quantile")
    meta = MetaSurvData(cfg["path_table"], data_split=data_split)
    if use_discrete:
        meta.generate_discrete_label(num_bins=cfg.get("time_bins"),
                                     use_quantiles=time_format == "quantile")
        if cfg.get("time_bins") is None:
            cfg["time_bins"] = meta.num_bins
            print(f"[setup] `time_bins` set to {meta.num_bins}.")
        assert cfg["time_bins"] == meta.num_bins
    else:
        meta.generate_continuous_label(normalize=time_format == "ratio")
    return meta


class SAHandler(BaseHandler):
    uses_vl = False

    def __init__(self, cfg):
        assert cfg["task"] == "sa", f"Expected task = `sa` but got {cfg['task']}."
        super().__init__(cfg)

    def _check_arguments(self, cfg):
        if "SurvMLE" in cfg["loss_type"]:
            assert cfg["net_output_converter"] == "sigmoid"
            assert cfg["evaluator"] == "NLL"
        elif "SurvIFMLE" in cfg["loss_type"]:
            assert cfg["net_output_converter"] == "softmax"
            assert cfg["evaluator"] == "NLL-IF"
        elif "SurvPLE" in cfg["loss_type"]:
            assert cfg["net_output_converter"] is None
            assert cfg["evaluator"] == "Cox"

    @staticmethod
    def func_load_meta_data(cfg, data_split=None):
        meta = build_surv_meta(cfg, data_split)
        if "discrete" in (meta.label_format or ""):
            dims = parse_str_dims(cfg["net_dims"])
            if dims[-1] != meta.num_bins:
                cfg["net_dims"] = "-".join(str(d) for d in dims[:-1]) + f"-{meta.num_bins}"
                print(f"[setup] `net_dims` changed to {cfg['net_dims']}.")
        return meta

    def func_load_model(self, cfg):
        dims = parse_str_dims(cfg["net_dims"])
        arch_cfg = fetch_kws(cfg, prefix=cfg["arch"].lower())
        module, params = load_model(cfg["arch"], dims, rng=self.rng, **arch_cfg)
        return module, params, {}

    def func_load_evaluator(self, cfg, meta_data=None):
        assert cfg["evaluator"] in ("Reg", "NLL", "NLL-IF", "Cox")
        kws = {"backend": "SurvivalEVAL", "meta_data": meta_data}
        if cfg["evaluator"] == "Reg":
            kws = {"end_time": meta_data.max_t}
        evaluator = load_evaluator(cfg["task"], cfg["evaluator"], **kws)
        return evaluator, evaluator.valid_metrics, ["c_index", "loss"]

    def func_prepare_dataset(self, patient_ids, set_name, cfg, meta_data=None):
        kws = {"meta_data": meta_data}
        if set_name == "train":
            kws["num_shot"] = cfg.get("num_shot", -1)
            if "seed_shot" in cfg:
                kws["seed_shot"] = cfg["seed_shot"]
        return prepare_surv_dataset(patient_ids, cfg, **kws)

    def save_prediction_results(self, data_cltor, path_to_save, **kws):
        save_prediction_surv(data_cltor["uid"], data_cltor["y"], data_cltor["y_hat"],
                             path_to_save, **kws)

    def _eval_and_print(self, cltor, name="", at_epoch=None):
        """Also re-evaluate each configured training loss on the collected
        predictions (ref runner/sa_handler.py:222-243)."""
        kws = {}
        if hasattr(self.evaluator, "_eval_ext_loss"):
            kws = dict(kws_ext_loss=self.loss, loss_weight=self.loss_weight)
        results = self.evaluator.compute(cltor, self.metrics_list, **kws)
        results = rename_keys(results, name, sep="/")
        print(f"[{name}] At epoch {at_epoch}:",
              " ".join(f"{k}={v:.6f}," for k, v in results.items()))
        if self.writer is not None:
            self.writer.log(results)
        self.jsonl.log({"event": "eval", "at": str(at_epoch), **results})
        return [results[name + "/" + k] for k in self.ret_metrics]
