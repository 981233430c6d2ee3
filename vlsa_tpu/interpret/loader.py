"""Load a trained VLSA model back from a run directory for interpretation
(ref utils/model_inference.py:11-21 + utils/func.py:219-241)."""
from __future__ import annotations

import os.path as osp

import jax
import yaml

from ..runner.ckpt import load_checkpoint, merge_params


def get_model_cfg(path_run_log: str) -> dict:
    """Read the config the handler saved next to its checkpoints."""
    full = osp.join(path_run_log, "config.yaml")
    if osp.exists(full):
        with open(full) as f:
            cfg = yaml.safe_load(f)
        print("[Model CFG] loaded config from", full)
        return cfg
    raise RuntimeError(f"[Model CFG] Model configuration is not found in {path_run_log}.")


def load_vlsa_from_run(run_path: str, ckpt_type: str = "last",
                       run_name: str = "train", return_cfg: bool = False):
    """Rebuild the VLSA module from a run dir and overlay its checkpoint
    (strict=False: the filtered-out frozen tower keeps rebuilt weights)."""
    from ..runner.vlsa import VLSAHandler

    cfg = get_model_cfg(run_path)
    shell = object.__new__(VLSAHandler)   # builder only; no lifecycle init
    shell.rng = jax.random.PRNGKey(cfg.get("seed", 42))
    module, params, _extras = VLSAHandler.func_load_model(shell, cfg)
    ckpt = load_checkpoint(
        osp.join(run_path, f"{run_name}_model-{ckpt_type}.ckpt"))
    params = merge_params(params, ckpt["model"])
    if return_cfg:
        return module, params, cfg
    return module, params
