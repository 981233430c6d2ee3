"""Config system: flat-YAML experiment configs with placeholder fill, prefix
namespacing, and grid expansion.

API parity with the reference CLI surface (see SURVEY.md §1):
  * flat YAML -> dict            (ref: main.py:22-25)
  * `{0}`/`{1}`/`{2}`/`{3}` path placeholders (ref: runner/base_handler.py:46-74)
  * prefix-namespaced sub-configs via `fetch_kws`  (ref: utils/func.py:136-147)
  * grid expansion of list-valued keys via `args_grid` (ref: utils/func.py:284-321)
  * save-path abbreviation of grid keys (ref: main.py:35-70)
"""
from __future__ import annotations

import itertools
import sys
from collections import OrderedDict
from typing import Any, Dict, List

import numpy as np
import yaml

# Dataset registry: per-cohort disk location + number of language priors
# (ref: runner/global_cfg.py:1-22).  `disk_location` is only meaningful when
# path templates contain `{1}`.
DATASET_CFG: Dict[str, Dict[str, Any]] = {
    "tcga_brca":   {"disk_location": "NAS02", "num_query": 10},
    "tcga_blca":   {"disk_location": "NAS01", "num_query": 12},
    "tcga_gbmlgg": {"disk_location": "NAS01", "num_query": 7},
    "tcga_luad":   {"disk_location": "NAS01", "num_query": 8},
    "tcga_ucec":   {"disk_location": "NAS01", "num_query": 10},
}


def load_config(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.load(f, Loader=yaml.FullLoader)


def fill_placeholder(target, fill, ind="{}"):
    """String-replace a placeholder, preserving int/float types (ref: utils/func.py:25-38)."""
    _target = str(target)
    if ind not in _target:
        return target
    new_target = _target.replace(ind, str(fill))
    if isinstance(target, int):
        return int(new_target)
    if isinstance(target, float):
        return float(new_target)
    return new_target


def fetch_kws(d: dict, prefix: str = "") -> dict:
    """Harvest `<prefix>_<key>` entries into a sub-dict (ref: utils/func.py:136-147)."""
    if prefix == "":
        return d
    ret = {}
    for k in d:
        if k.startswith(prefix):
            new_key = k.split(prefix)[1]
            if len(new_key) < 2:
                continue
            ret[new_key[1:]] = d[k]
    return ret


def parse_str_dims(s, sep="-", dtype=int) -> list:
    """'256-256-4' -> [256, 256, 4] (ref: utils/func.py:149-153)."""
    if not isinstance(s, str):
        return [s]
    return [dtype(x) for x in s.split(sep)]


def args_grid(kwargs: dict) -> List[dict]:
    """Expand list-valued keys into the cartesian grid of configs.

    Iteration order matches the reference (np.meshgrid(...).T order over the
    OrderedDict of list-valued keys, ref: utils/func.py:284-321), so save-path
    suffixes and run ordering are reproducible.
    """
    listed = OrderedDict((k, v) for k, v in kwargs.items() if isinstance(v, list))
    fixed = {k: v for k, v in kwargs.items() if not isinstance(v, list)}
    if not listed:
        return [dict(kwargs)]
    grid = np.array(np.meshgrid(*listed.values()), dtype=object).T.reshape(-1, len(listed))
    out = []
    for row in grid:
        cfg = dict(fixed)
        cfg.update({k: row[i] for i, k in enumerate(listed)})
        out.append(cfg)
    return out


# Abbreviations used to build save-path suffixes in multi-run mode
# (ref: main.py:35-58).
ABBR_MAPS = {
    "vlsa_img_encoder_name": "mil",
    "vlsa_img_encoder_query": "que",
    "vlsa_img_encoder_query_pooling": "qpool",
    "vlsa_img_encoder_query_text_method": "tex",
    "vlsa_img_encoder_query_text_load_idx": "qkey",
    "vlsa_img_encoder_gated_query": "gatq",
    "vlsa_img_encoder_query_text_res_ratio": "resr",
    "vlsa_img_encoder_pred_head": "head",
    "vlsa_pmt_learner_coop_method": "coop",
    "vlsa_pmt_learner_adapter_method": "adap",
    "data_split_seed": "fold",
    "num_shot": "shot",
    "seed_shot": "fssd",
    "vlsa_img_encoder_pooling": "pool",
    "dataset_name": "data",
}

# Grid keys never appended to save_path (ref: main.py:60-70).
_IGNORE_IN_SAVE_PATH = {
    "num_shot": lambda x: x < 0,
    "dataset_name": lambda x: True,
}


def convert_to_abbr(key):
    return ABBR_MAPS.get(key, key)


def ignore_in_save_path(key, value) -> bool:
    fn = _IGNORE_IN_SAVE_PATH.get(key)
    return bool(fn(value)) if fn is not None else False


def print_config(config: dict, print_to_path=None):
    """Echo config sorted by key (ref: utils/func.py:243-257)."""
    f = open(print_to_path, "w") if print_to_path is not None else sys.stdout
    print("**************** MODEL CONFIGURATION ****************", file=f)
    for key in sorted(config.keys()):
        keystr = "{}".format(key) + (" " * (24 - len(key)))
        print("{} -->   {}".format(keystr, config[key]), file=f)
    print("**************** MODEL CONFIGURATION ****************", file=f)
    if print_to_path is not None:
        f.close()


def save_config(config: dict, path_to_save: str):
    with open(path_to_save, "w") as f:
        yaml.dump(config, f)


def print_metrics(metrics: dict, print_to_path=None):
    """Write the final metric table (ref: utils/func.py:263-282)."""
    f = open(print_to_path, "w") if print_to_path is not None else sys.stdout
    print("**************** MODEL METRICS ****************", file=f)
    for key in sorted(metrics.keys()):
        for name, value in metrics[key]:
            cur_key = key + "/" + name
            keystr = "{}".format(cur_key) + (" " * (20 - len(cur_key)))
            valstr = "{}".format(value)
            if isinstance(value, list):
                valstr = "{}, avg/std = {:.5f}/{:.5f}".format(valstr, np.mean(value), np.std(value))
            print("{} -->   {}".format(keystr, valstr), file=f)
    print("**************** MODEL METRICS ****************", file=f)
    if print_to_path is not None:
        f.close()


def rename_keys(d: dict, prefix_name: str, sep: str = "/") -> dict:
    return {prefix_name + sep + k: v for k, v in d.items()}
