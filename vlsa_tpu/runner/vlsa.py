"""VLSA handler: vision-language survival models with ordinal prompts.

Behavioural port of ref runner/vlsa_handler.py:21-345: builds the prompt
learner / text / image encoder configs from prefixed keys, freezes modules
per config (as optimizer masks), binds the QueryDiv network loss, and
evaluates logit-scale-aware ext losses.
"""
from __future__ import annotations

from ..config import fetch_kws
from ..data import prepare_surv_dataset
from ..data.io import save_prediction_surv
from ..eval import load_evaluator
from ..models import load_model
from ..config import rename_keys
from .base import BaseHandler
from .sa import build_surv_meta


class VLSAHandler(BaseHandler):
    uses_vl = True

    def __init__(self, cfg):
        assert cfg["task"] == "vlsa", f"Expected task = `vlsa` but got {cfg['task']}."
        super().__init__(cfg)

    def _check_arguments(self, cfg):
        if "SurvMLE" in cfg["loss_type"]:
            assert cfg["net_output_converter"] == "sigmoid"
            assert cfg["evaluator"] == "VL"
        elif "SurvIFMLE" in cfg["loss_type"]:
            assert cfg["net_output_converter"] == "softmax"
            assert cfg["evaluator"] == "VL-IF"

    @staticmethod
    def func_load_meta_data(cfg, data_split=None):
        meta = build_surv_meta(cfg, data_split)
        if "discrete" in (meta.label_format or ""):
            for learner in ("coop", "adapter"):
                key = f"vlsa_pmt_learner_{learner}_num_ranks"
                if key in cfg and cfg[key] != meta.num_bins:
                    print(f"[setup] `{key}` set to {meta.num_bins}.")
                    cfg[key] = meta.num_bins
        return meta

    def func_load_model(self, cfg):
        """ref vlsa_handler.py:87-151."""
        arch = cfg["arch"]
        pmt_name = cfg["vlsa_pmt_learner_name"]
        prompt_learner_cfg = fetch_kws(
            cfg, prefix=f"{arch.lower()}_pmt_learner_{pmt_name.lower()}")
        prompt_learner_cfg["name"] = pmt_name
        prompt_learner_cfg["pretrained"] = cfg.get("vlsa_pmt_learner_pretrained", False)
        pretrained_cfg = None
        if prompt_learner_cfg["pretrained"]:
            pretrained_cfg = fetch_kws(cfg, prefix="vlsa_pmt_learner_coop")
            assert pretrained_cfg.get("ckpt"), "Found null ckpt path."
            pretrained_cfg["ckpt"] = pretrained_cfg["ckpt"].format(
                cfg["data_split_seed"], pretrained_cfg.get("method"))

        # real frozen-tower weights: `path_clip_model` may point at the
        # released checkpoint file itself, or a dir containing
        # <txt_encoder_name>/pytorch_model.bin (ref model/conch/factory.py
        # loads the same artifact); absent -> random init (architecture-
        # faithful; the weights are not redistributable with this repo)
        vl_weights = None
        root = cfg.get("path_clip_model")
        if root:
            import os.path as _osp
            txt_name = cfg.get(f"{arch.lower()}_txt_encoder_name", "")
            candidates = [root,
                          _osp.join(root, "pytorch_model.bin"),
                          _osp.join(root, txt_name, "pytorch_model.bin")]
            ckpt_path = next((c for c in candidates if _osp.isfile(c)), None)
            if ckpt_path is not None:
                from ..utils.torch_import import import_text_tower_from_checkpoint
                vl_weights = import_text_tower_from_checkpoint(
                    ckpt_path, api=cfg[f"{arch.lower()}_api"])
                print(f"[setup] frozen text-tower weights imported from {ckpt_path}")

        arch_cfg = {
            "vlsa_api": cfg[f"{arch.lower()}_api"],
            "text_encoder_cfg": fetch_kws(cfg, prefix=f"{arch.lower()}_txt_encoder"),
            "image_encoder_cfg": fetch_kws(cfg, prefix=f"{arch.lower()}_img_encoder"),
            "prompt_learner_cfg": prompt_learner_cfg,
            "pretrained_prompt_learner_cfg": pretrained_cfg,
            "path_clip_model": cfg.get("path_clip_model"),
            "vl_weights": vl_weights,
            "tower_overrides": cfg.get("_test_tower_overrides"),
        }
        module, params, tokenizer = load_model(arch, rng=self.rng, **arch_cfg)

        # frozen tower + bf16 compute: store the resblock matmul weights in
        # bf16 once — numerically identical to the per-step .astype the tower
        # does anyway, but removes the loop-invariant cast from every train
        # step and halves the tower's weight HBM traffic (docs/PERF.md)
        txt_cfg = arch_cfg["text_encoder_cfg"]
        tower_dtype = (arch_cfg.get("tower_overrides") or {}).get(
            "dtype", txt_cfg.get("dtype"))
        if txt_cfg.get("frozen", True) and str(tower_dtype) == "bfloat16":
            from ..models.precision import cast_frozen_tower_weights
            params = cast_frozen_tower_weights(dict(params))
            print("[setup] frozen text-tower matmul weights stored in bf16")
        return module, params, {"tokenizer": tokenizer, "arch_cfg": arch_cfg}

    def frozen_paths(self, cfg):
        """Freeze flags -> optimizer zero-update subtrees
        (ref vlsa_handler.py:126-149)."""
        arch = cfg["arch"].lower()
        paths = []
        txt_cfg = fetch_kws(cfg, prefix=f"{arch}_txt_encoder")
        img_cfg = fetch_kws(cfg, prefix=f"{arch}_img_encoder")
        if txt_cfg.get("frozen", True):
            paths.append("prompt_encoder")
        if img_cfg.get("frozen", False):
            paths.append("mil_encoder")
        if cfg.get(f"{arch}_frozen_logit_scale", False):
            paths.append("logit_scale")
        pmt_name = cfg["vlsa_pmt_learner_name"]
        if pmt_name == "CoOp":
            coop = fetch_kws(cfg, prefix=f"{arch}_pmt_learner_coop")
            if coop.get("frozen_context_embeds"):
                paths.append("prompt_learner/context_embeds")
            if coop.get("frozen_rank_embeds"):
                paths.append("prompt_learner/rank_embeds")
        return paths

    def func_load_evaluator(self, cfg, meta_data=None):
        assert cfg["evaluator"] in ("VL", "VL-IF")
        evaluator = load_evaluator(cfg["task"], cfg["evaluator"],
                                   backend="SurvivalEVAL", meta_data=meta_data)
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

    def add_network_loss(self, cfg):
        """Bind QueryDiv to the network (ref vlsa_handler.py:181-187)."""
        if "QueryDiv" in self.loss:
            assert self.loss["QueryDiv"] is None
            kws = fetch_kws(cfg, prefix="loss_querydiv")
            model, params_holder = self.model, self

            def qd(**extra):
                return model.apply({"params": params_holder.params},
                                   method=model.query_div_loss, **{**kws, **extra})

            self.loss["QueryDiv"] = qd

    def _eval_and_print(self, cltor, name="", at_epoch=None):
        """Adds per-loss re-evaluation with the live logit scale
        (ref vlsa_handler.py:291-313)."""
        results = self.evaluator.compute(
            cltor, self.metrics_list,
            kws_ext_loss=self.loss,
            loss_weight=self.loss_weight,
            logit_scale=self.get_logit_scale_value(),
        )
        results = rename_keys(results, name, sep="/")
        print(f"[{name}] At epoch {at_epoch}:",
              " ".join(f"{k}={v:.6f}," for k, v in results.items()))
        if self.writer is not None:
            self.writer.log(results)
        self.jsonl.log({"event": "eval", "at": str(at_epoch), **results})
        return [results[name + "/" + k] for k in self.ret_metrics]
