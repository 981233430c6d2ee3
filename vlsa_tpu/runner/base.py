"""Experiment lifecycle: config fill, data, model, losses, training, eval.

Behavioural port of ref runner/base_handler.py:34-694 with a TPU-first
training loop: the reference's batch_size=1 + bp_every_batch=32 Python
accumulation becomes one jitted step over a padded 32-bag batch (identical
averaged loss, one optimizer step per 32 bags), fed by a prefetching host
pipeline.
"""
from __future__ import annotations

import os
import os.path as osp
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    DATASET_CFG,
    fill_placeholder,
    fetch_kws,
    parse_str_dims,
    print_config,
    print_metrics,
    rename_keys,
    save_config,
)
from ..data import BagBatcher, read_file_data_splitting
from ..data.io import load_init_text
from ..eval import load_evaluator
from ..losses import load_loss
from ..optim import EarlyStopping, ReduceLROnPlateau, create_optimizer
from ..utils import seed_everything
from ..utils.observability import JsonlLogger, configure_debug, maybe_profile
from .ckpt import add_prefix_to_filename, load_checkpoint, merge_params, save_checkpoint
from .engine import TrainEngine, make_objective, make_output_converter


def _maybe_wandb(cfg, run_name):
    if not cfg.get("wandb_prj") or os.environ.get("VLSA_TPU_DISABLE_WANDB", "1") == "1":
        return None
    try:
        import wandb
        return wandb.init(project=cfg["wandb_prj"], name=run_name,
                          dir=cfg.get("wandb_dir", "."), config=cfg, reinit=True)
    except Exception as exc:  # wandb is strictly optional
        print(f"[setup] wandb disabled ({exc})")
        return None


class BaseHandler:
    """Generic handler; SA/VLSA/CLF specialise the hooks (ref base_handler.py)."""

    task_assert: Optional[str] = None

    def __init__(self, cfg: dict):
        from ..config_schema import validate_config
        validate_config(cfg, cfg.get("task", ""), strict=cfg.get("strict_config", False))
        seed_everything(cfg["seed"])
        configure_debug(cfg)
        self.rng = jax.random.PRNGKey(cfg["seed"])

        dataset_name = cfg["dataset_name"]
        print(f"[setup] dataset name: {dataset_name}.")
        if not cfg.get("test", False):
            cfg["save_path"] = fill_placeholder(cfg["save_path"], dataset_name[5:], ind="{0}")
            for key in ("path_patch", "path_coord", "path_cluster", "path_graph",
                        "path_table", "data_split_path",
                        "vlsa_img_encoder_query_text_load_idx"):
                if key in cfg:
                    cfg[key] = fill_placeholder(cfg[key], dataset_name, ind="{0}")
            for key in ("path_patch", "path_cluster", "path_graph", "path_coord"):
                if key in cfg and dataset_name in DATASET_CFG:
                    cfg[key] = fill_placeholder(
                        cfg[key], DATASET_CFG[dataset_name]["disk_location"], ind="{1}")
            cfg["data_split_path"] = fill_placeholder(
                cfg["data_split_path"], cfg["data_split_seed"], ind="{2}")
            key = "vlsa_img_encoder_num_query"
            if key in cfg:
                if cfg[key] is None:
                    init_texts = load_init_text(
                        cfg["vlsa_img_encoder_query_text_load_path"],
                        key=cfg["vlsa_img_encoder_query_text_load_idx"])
                    cfg[key] = len(init_texts)
                    print(f"[info] null `{key}` filled with {cfg[key]}.")
                elif dataset_name in DATASET_CFG:
                    cfg[key] = int(fill_placeholder(
                        cfg[key], DATASET_CFG[dataset_name]["num_query"], ind="{3}"))
            os.makedirs(cfg["save_path"], exist_ok=True)
            run_name = cfg["save_path"].split("/")[-1]
            base = cfg["save_path"]
        else:
            if "{}" in str(cfg.get("test_load_path", "")):
                cfg["test_load_path"] = cfg["test_load_path"].format(cfg["data_split_seed"])
            os.makedirs(cfg["test_save_path"], exist_ok=True)
            run_name = cfg["test_save_path"].split("/")[-1]
            base = cfg["test_save_path"]

        load_base = cfg.get("test_load_path", base) if cfg.get("test", False) else base
        self.last_ckpt_path = osp.join(load_base, "model-last.ckpt")
        self.best_ckpt_path = osp.join(load_base, "model-best.ckpt")
        self.last_metrics_path = osp.join(base, "metrics-last.txt")
        self.best_metrics_path = osp.join(base, "metrics-best.txt")
        self.config_path = osp.join(base, "print_config.txt")
        self.config_yaml = osp.join(base, "config.yaml")
        self.writer = _maybe_wandb(cfg, run_name)
        self.jsonl = JsonlLogger(osp.join(base, "metrics.jsonl"))
        print(f"[setup] path to save: {base}")

        # Data setup
        self.data_split = self.func_load_data_split(cfg)
        self.data_meta = self.func_load_meta_data(cfg, data_split=self.data_split)

        # Model / loss / optimizer / evaluator
        self.model, self.params, self.aux = self.func_load_model(cfg)
        self.loss, self.loss_weight = self.func_load_loss(cfg)
        self.add_network_loss(cfg)
        self.tx, self.opt_state, self.lr_value = self.func_load_optimizer(cfg)
        self.steplr = self.func_load_lrs(cfg)
        self.output_converter = make_output_converter(cfg.get("net_output_converter"))
        self.evaluator, self.metrics_list, self.ret_metrics = self.func_load_evaluator(
            cfg, meta_data=self.data_meta)
        self.engine = self.func_build_engine(cfg)

        self._check_arguments(cfg)
        self.uid: Dict[str, list] = {}
        self.cfg = cfg
        print_config(cfg, print_to_path=self.config_path)
        save_config(cfg, self.config_yaml)

    # ------------------------------------------------------------------ hooks
    def _check_arguments(self, cfg):
        pass

    @staticmethod
    def func_load_data_split(cfg):
        return read_file_data_splitting(cfg["data_split_path"])

    @staticmethod
    def func_load_meta_data(cfg, data_split=None):
        return None

    def func_load_model(self, cfg):
        raise NotImplementedError

    @staticmethod
    def func_load_loss(cfg):
        loss_names = parse_str_dims(cfg["loss_type"], dtype=str)
        kws_loss = {"loss_type": loss_names}
        loss_weight = {}
        for name in loss_names:
            kws_loss[name] = fetch_kws(cfg, prefix=f"loss_{name.lower()}")
            loss_weight[name] = cfg.get(f"loss_{name.lower()}_weight", 1)
        return load_loss(cfg["task"], **kws_loss), loss_weight

    def add_network_loss(self, cfg):
        pass

    def frozen_paths(self, cfg):
        return []

    def func_load_optimizer(self, cfg):
        from ..optim.factory import frozen_mask_from_cfg
        frozen = frozen_mask_from_cfg(self.params, self.frozen_paths(cfg))
        self.frozen_mask = frozen
        tx = create_optimizer(cfg["opt_name"], cfg["opt_lr"],
                              cfg.get("opt_weight_decay", 0.0), self.params,
                              frozen=frozen)
        opt_state = tx.init(self.params)
        return tx, opt_state, cfg["opt_lr"]

    def func_load_lrs(self, cfg):
        if not cfg.get("lrs"):
            print("[setup] learning rate scheduler is disabled.")
            return None
        return ReduceLROnPlateau(cfg["opt_lr"], factor=cfg.get("lrs_factor", 0.5),
                                 patience=cfg.get("lrs_patience", 10))

    def func_load_evaluator(self, cfg, meta_data=None):
        raise NotImplementedError

    def func_build_engine(self, cfg) -> TrainEngine:
        objective = make_objective(self.loss, self.loss_weight,
                                   make_output_converter(cfg.get("net_output_converter")),
                                   uses_vl=self.uses_vl)
        mesh, tp, sp = None, False, False
        if cfg.get("mesh"):
            from ..parallel import make_mesh
            m = cfg["mesh"]
            mesh = make_mesh(n_data=m.get("data"), n_model=m.get("model", 1),
                             dcn_data=m.get("dcn"))
            n_model = mesh.shape["model"]
            # model-axis sharding defaults on whenever the axis exists:
            # tensor parallel for the text-tower MLP, sequence parallel for
            # the patch axis (VLFAN partial-softmax combine)
            tp = bool(m.get("tensor_parallel", n_model > 1))
            sp = bool(m.get("seq_parallel", n_model > 1)) and n_model > 1
            print(f"[setup] mesh: data={mesh.shape['data']} model={n_model} "
                  f"(tensor_parallel={tp}, seq_parallel={sp})")
            if sp:
                self.model = self._route_seq_parallel(self.model, mesh)
        engine = TrainEngine(self.model, self.tx, objective, uses_vl=self.uses_vl,
                             has_query_div="QueryDiv" in self.loss,
                             accum_steps=cfg.get("accum_steps", 1), mesh=mesh,
                             frozen=getattr(self, "frozen_mask", None),
                             tensor_parallel=tp, seq_parallel=sp,
                             needs_hessian=cfg["opt_name"].lower() == "adahessian")
        if mesh is not None:
            # place params on the mesh (TP layout for the text-tower MLP) and
            # rebuild the optimizer state so moments inherit those shardings
            self.params = engine.shard_params(self.params)
            self.opt_state = engine.init_opt_state(self.params)
        return engine

    @staticmethod
    def _route_seq_parallel(model, mesh):
        """Bind the mesh into the model's pooling so it runs an explicit
        sequence-parallel shard_map path: VLFAN co-attention
        (parallel.coattn_sp) or ABMIL attention pooling
        (parallel.abmil_sp)."""
        from ..models.mil import DeepMIL, VLFAN

        def routable(m):
            return isinstance(m, VLFAN) or (
                isinstance(m, DeepMIL) and m.pooling == "attention")

        if routable(model):
            return model.clone(sp_mesh=mesh)
        mil = getattr(model, "mil_encoder", None)
        if routable(mil):
            return model.clone(mil_encoder=mil.clone(sp_mesh=mesh))
        print("[setup] seq_parallel: model has no VLFAN/ABMIL attention "
              "pooling; patch-axis sharding is left to XLA's SPMD partitioner")
        return model

    uses_vl = False

    def func_prepare_dataset(self, patient_ids, set_name, cfg, meta_data=None):
        raise NotImplementedError

    def save_prediction_results(self, data_cltor, path_to_save, **kws):
        raise NotImplementedError

    def get_logit_scale_value(self):
        assert "logit_scale" in self.params, (
            "logit-scale-aware losses/evaluators need a model with a "
            "`logit_scale` param (VL models have one, ref model/vlsa.py:49); "
            "remove SurvEMD/SurvT2I ext-loss evaluation for this model.")
        return float(np.exp(np.asarray(self.params["logit_scale"])))

    # ------------------------------------------------------------------ exec
    def _make_batcher(self, dataset, cfg, shuffle):
        num_shards, shard_index = 1, 0
        if jax.process_count() > 1:
            # each host loads only its slice of every global batch
            num_shards, shard_index = jax.process_count(), jax.process_index()
        return BagBatcher(
            dataset,
            num_shards=num_shards, shard_index=shard_index,
            batch_size=cfg.get("bp_every_batch", 32) if shuffle
            else cfg.get("eval_batch_size", cfg.get("bp_every_batch", 32)),
            shuffle=shuffle, seed=cfg["seed"],
            min_bucket=cfg.get("min_bucket", 256),
            max_bucket=cfg.get("max_bucket"),
            fixed_bucket=cfg.get("fixed_bucket"),
            feats_dtype=cfg.get("feats_dtype", "float32"),
            precompute_inv=cfg.get("feats_precompute_inv", True),
            prefetch=cfg.get("prefetch", 2),
            overflow=cfg.get("bag_overflow", "error"),
        )

    def exec(self):
        cfg = self.cfg
        print(f"[exec] with task = {cfg['task']}, arch = {cfg['arch']}.")
        pids_train = self.data_split["train"]
        train_set = self.func_prepare_dataset(pids_train, "train", cfg, self.data_meta)
        self.uid["train"] = train_set.uid
        pids_test = self.data_split["test"]
        test_set = self.func_prepare_dataset(pids_test, "test", cfg, self.data_meta)
        self.uid["test"] = test_set.uid
        val_set = None
        if "validation" in self.data_split:
            val_set = self.func_prepare_dataset(
                self.data_split["validation"], "validation", cfg, self.data_meta)
            self.uid["validation"] = val_set.uid

        run_name = "train"
        zero_shot_eval = False
        if cfg.get("force_to_skip_training"):
            print("[exec] warning: your training is skipped...")
        elif cfg.get("num_shot", -1) == 0:
            zero_shot_eval = True
            run_name = "zero-shot"
            print("[exec] warning: at zero-shot mode, your training is skipped...")
        else:
            val_loaders = {"validation": val_set, "test": test_set}
            if cfg.get("eval_training_loader_per_epoch"):
                val_loaders["eval-train"] = train_set
                self.uid["eval-train"] = train_set.uid
            self._run_training(cfg["epochs"], train_set, "train",
                               val_loaders=val_loaders, val_name="validation",
                               save_ckpt=True, early_stop=bool(cfg.get("es")),
                               run_name=run_name)

        if zero_shot_eval:
            evals = {"test": test_set}
            metrics = self._eval_all(evals, ckpt_type="zero-shot", run_name=run_name)
        else:
            evals = {"train": train_set, "validation": val_set, "test": test_set}
            metrics = self._eval_all(evals, ckpt_type=cfg.get("ckpt_for_eval", "last"),
                                     run_name=run_name)
        return metrics

    def exec_test(self):
        cfg = self.cfg
        pids = self.data_split[cfg["test_path"]]
        test_set = self.func_prepare_dataset(pids, cfg["test_path"], cfg, self.data_meta)
        self.uid["exec-test"] = test_set.uid
        return self._eval_all({"exec-test": test_set},
                              ckpt_type=cfg.get("ckpt_for_eval", "last"),
                              test_mode=True)

    # ------------------------------------------------------------------ train
    def _run_training(self, epochs, train_set, name_loader, val_loaders=None,
                      val_name=None, save_ckpt=True, early_stop=False,
                      run_name="train"):
        cfg = self.cfg
        es = EarlyStopping(warmup=cfg.get("es_warmup", 0),
                           patience=cfg.get("es_patience", 20),
                           start_epoch=cfg.get("es_start_epoch", 0),
                           verbose=cfg.get("es_verbose", False)) if early_stop else None
        self.es = es  # exposed for inspection/tests
        train_batcher = self._make_batcher(train_set, cfg, shuffle=True)
        step_fn = self.engine.train_step()
        last_epoch = -1
        start_epoch = 0
        if cfg.get("auto_resume"):
            # fault tolerance: restart idempotence (SURVEY.md §5 elastic row;
            # the reference's resume_model exists but nothing calls it, ref
            # base_handler.py:684-693) — pick up from the last epoch ckpt
            resume_path = add_prefix_to_filename(self.last_ckpt_path, run_name)
            if osp.exists(resume_path):
                start_epoch = self.resume_model("last", run_name)
                print(f"[train] auto-resume: continuing from epoch {start_epoch}")
        for epoch in range(start_epoch, epochs):
            last_epoch = epoch + 1
            t0 = time.time()
            with maybe_profile(cfg.get("profile_dir") if epoch == 1 else None):
                train_cltor = self._train_each_epoch(epoch + 1, train_batcher, step_fn)
            dt = time.time() - t0
            sps = len(train_set) / max(dt, 1e-9)
            print(f"[train] epoch {epoch+1}/{epochs}: {sps:.2f} slides/sec")
            self.jsonl.log({"event": "epoch", "epoch": epoch + 1,
                            "slides_per_sec": sps, "wall_sec": dt})
            for k_c, v_c in train_cltor.items():
                self._eval_and_print(v_c, name=f"{name_loader}/{k_c}", at_epoch=epoch + 1)

            monitor = None
            if val_loaders:
                for k, ds in val_loaders.items():
                    if ds is None:
                        continue
                    cltor = self.test_model(self.params, ds, k)
                    for k_c, v_c in cltor.items():
                        met_main, met_loss = self._eval_and_print(
                            v_c, name=f"{k}/{k_c}", at_epoch=epoch + 1)
                        if k == val_name and k_c == "pred":
                            monitor = 0
                            monitor += met_loss if "loss" in cfg.get("monitor_metrics", "loss") else 0
                            monitor += -met_main if "main" in cfg.get("monitor_metrics", "") else 0
            if self.steplr is not None and monitor is not None:
                new_lr = self.steplr.step(monitor)
                if abs(new_lr - self.lr_value) > 1e-12:
                    self.lr_value = new_lr
                    self.opt_state.hyperparams["learning_rate"] = jnp.asarray(new_lr)
            if es is not None and monitor is not None:
                es(epoch, monitor)
                if es.save_ckpt():
                    self._save_model(epoch + 1, "best", run_name)
                if es.stop():
                    break
            if cfg.get("auto_resume") and save_ckpt:
                # periodic last-ckpt so a mid-run restart loses <= 1 epoch
                self._save_model(epoch + 1, "last", run_name)
        if save_ckpt:
            self._save_model(last_epoch, "last", run_name)
            print(f"[train] {run_name} last model saved at epoch {last_epoch}")

    def _train_each_epoch(self, epoch, train_batcher, step_fn):
        all_raw, all_gt, all_idx = [], [], []
        for batch in train_batcher:
            self.rng, step_rng = jax.random.split(self.rng)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            jb = self.engine.shard_batch(jb)
            self.params, self.opt_state, loss, raw = step_fn(
                self.params, self.opt_state, jb, step_rng)
            # multi-host: `raw` is a globally-sharded array and the batch
            # dict holds only this host's slice — gather both (no-ops on a
            # single process, parallel.multihost)
            from ..parallel.multihost import collect_global, host_allgather
            valid = host_allgather(batch["valid"])
            all_raw.append(collect_global(raw)[valid])
            all_gt.append(np.stack([host_allgather(batch["t"])[valid],
                                    host_allgather(batch["e"])[valid]], 1))
            all_idx.append(host_allgather(batch["idx"])[valid])
            if self.writer is not None:
                self.writer.log({"train/batch_loss": float(loss)})
        all_raw = np.concatenate(all_raw)
        all_gt = np.concatenate(all_gt)
        all_idx = np.concatenate(all_idx)
        all_pred = np.asarray(self.output_converter(jnp.asarray(all_raw)))
        uids = [self.uid["train"][i] for i in all_idx]
        return {"pred": self._finalize_cltor(
            {"y": all_gt, "raw_y_hat": all_raw, "y_hat": all_pred,
             "uid": uids, "name": "train"})}

    def test_model(self, params, dataset, loader_name, ckpt_path=None):
        if ckpt_path is not None:
            loaded = load_checkpoint(ckpt_path)
            self.params = merge_params(self.params, loaded["model"])
            params = self.params
        eval_fn = self.engine.eval_step()
        # params are fixed for the whole eval pass -> encode the prompts /
        # queries ONCE instead of once per batch (bit-identical; saves the
        # full text-tower forward per batch, docs/PERF.md)
        pre = self.engine.text_precompute()
        if pre is not None and self.cfg.get("eval_precompute_text", True):
            text_features, query = pre(params)
            step_pre = self.engine.eval_step_precomputed()

            def eval_fn(p, jb, _tf=text_features, _q=query):  # noqa: E731
                return step_pre(p, jb, _tf, _q)
        batcher = self._make_batcher(dataset, self.cfg, shuffle=False)
        all_raw, all_gt, all_idx = [], [], []
        for batch in batcher:
            jb = {k: v for k, v in batch.items()
                  if k in ("feats", "feats_scale", "feats_inv", "mask",
                           "cluster_id", "edge_index", "edge_valid")}
            # mesh runs shard the eval batch too (multi-host: assembles the
            # global arrays from this host's slice); single-device: as-is
            jb = (self.engine.shard_batch(jb) if self.engine.mesh is not None
                  else {k: jnp.asarray(v) for k, v in jb.items()})
            raw = eval_fn(params, jb)
            from ..parallel.multihost import collect_global, host_allgather
            valid = host_allgather(batch["valid"])
            all_raw.append(collect_global(raw)[valid])
            all_gt.append(np.stack([host_allgather(batch["t"])[valid],
                                    host_allgather(batch["e"])[valid]], 1))
            all_idx.append(host_allgather(batch["idx"])[valid])
        all_raw = np.concatenate(all_raw)
        all_gt = np.concatenate(all_gt)
        all_idx = np.concatenate(all_idx)
        all_pred = np.asarray(self.output_converter(jnp.asarray(all_raw)))
        uids = [self.uid[loader_name][i] for i in all_idx]
        return {"pred": self._finalize_cltor(
            {"y": all_gt, "raw_y_hat": all_raw, "y_hat": all_pred,
             "uid": uids, "name": loader_name})}

    def _finalize_cltor(self, cltor: dict) -> dict:
        return cltor

    # ------------------------------------------------------------------ eval
    def _eval_all(self, evals_loader, ckpt_type="best", run_name="train",
                  test_mode=False):
        cfg = self.cfg
        save_pred_path = cfg["test_save_path"] if test_mode else cfg["save_path"]
        ckpt_run_name = "train" if test_mode else run_name
        group = cfg.get("test_mode_name", "test_mode") if test_mode else run_name
        if ckpt_type == "best":
            ckpt_path = add_prefix_to_filename(self.best_ckpt_path, ckpt_run_name)
            print_path = add_prefix_to_filename(self.best_metrics_path, group)
            wandb_group, csv_name = f"bestckpt/{group}", f"{cfg['task']}_{group}_best"
        elif ckpt_type == "last":
            ckpt_path = add_prefix_to_filename(self.last_ckpt_path, ckpt_run_name)
            print_path = add_prefix_to_filename(self.last_metrics_path, group)
            wandb_group, csv_name = f"lastckpt/{group}", f"{cfg['task']}_{group}_last"
        else:  # zero-shot
            ckpt_path = None
            print_path = add_prefix_to_filename(self.best_metrics_path, group)
            wandb_group, csv_name = f"lastckpt/{group}", f"{cfg['task']}_{group}_last"
        if ckpt_path is not None and not osp.exists(ckpt_path):
            ckpt_path = None

        metrics = {}
        for k, ds in evals_loader.items():
            if ds is None:
                continue
            cltor = self.test_model(self.params, ds, k, ckpt_path=ckpt_path)
            ckpt_path = None  # load once
            metrics[k] = []
            for k_c, v_c in cltor.items():
                met_main, met_loss = self._eval_and_print(
                    v_c, name=f"{wandb_group}/{k}/{k_c}", at_epoch=ckpt_type)
                metrics[k].append((f"{k_c}_{self.ret_metrics[0]}", met_main))
                metrics[k].append((f"{k_c}_{self.ret_metrics[1]}", met_loss))
            if cfg.get("save_prediction"):
                full = osp.join(save_pred_path, f"{csv_name}_pred_{k}.csv")
                self.save_prediction_results(cltor["pred"], full,
                                             type_pred=cfg.get("evaluator"))
        print_metrics(metrics, print_to_path=print_path)
        return metrics

    def _eval_and_print(self, cltor, name="", at_epoch=None):
        results = self.evaluator.compute(cltor, self.metrics_list)
        results = rename_keys(results, name, sep="/")
        print(f"[{name}] At epoch {at_epoch}:",
              " ".join(f"{k}={v:.6f}," for k, v in results.items()))
        if self.writer is not None:
            self.writer.log(results)
        self.jsonl.log({"event": "eval", "at": str(at_epoch), **results})
        return [results[name + "/" + k] for k in self.ret_metrics]

    # ------------------------------------------------------------------ ckpt
    def _save_model(self, epoch, ckpt_type, run_name):
        path = self.best_ckpt_path if ckpt_type == "best" else self.last_ckpt_path
        save_checkpoint(add_prefix_to_filename(path, run_name), epoch, self.params,
                        module_filter=self.cfg.get("model_saver_module_filter"),
                        backend=self.cfg.get("ckpt_backend", "msgpack"),
                        opt_state=(self.opt_state
                                   if self.cfg.get("save_optimizer", True) else None))

    def resume_model(self, ckpt_type: str = "best", run_name: str = "train"):
        """Resume params (+optimizer moments when saved) from a run checkpoint
        (ref base_handler.py:684-693): strict=False merge, so filtered-out
        modules (e.g. the frozen text tower) keep their current values."""
        from flax import serialization
        if ckpt_type == "last":
            path = add_prefix_to_filename(self.last_ckpt_path, run_name)
        elif ckpt_type == "best":
            path = add_prefix_to_filename(self.best_ckpt_path, run_name)
        else:
            raise KeyError(f"Expected best or last for `ckpt_type`, got {ckpt_type}.")
        ckpt = load_checkpoint(path)
        self.params = merge_params(self.params, ckpt["model"])
        if "optimizer" in ckpt and self.opt_state is not None:
            self.opt_state = serialization.from_state_dict(
                self.opt_state, ckpt["optimizer"])
        print(f"[model] resume the network from {ckpt_type}_{run_name} "
              f"at epoch {ckpt['epoch']}...")
        return ckpt["epoch"]
