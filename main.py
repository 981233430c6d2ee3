"""CLI entry — API parity with the reference experiment surface
(ref main.py:13-123):

    python3 main.py --config <yaml> --handler {SA,VLSA,CLF} [--multi_run] [--sleep N]

Grid expansion of list-valued config keys, abbreviated save-path suffixes,
single-run or multi-run execution.
"""
import argparse
import time

from vlsa_tpu.config import (
    args_grid,
    convert_to_abbr,
    ignore_in_save_path,
    load_config,
    print_config,
)
from vlsa_tpu.runner import BaseHandler, CLFHandler, SAHandler, VLSAHandler


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", "-f", required=True, type=str,
                        help="Path to the config file.")
    parser.add_argument("--handler", "-d", type=str, choices=["SA", "VLSA", "CLF"],
                        default="VLSA", help="Model handler.")
    parser.add_argument("--multi_run", action="store_true",
                        help="If execute multi-experiments in this run.")
    parser.add_argument("--sleep", type=int, default=0,
                        help="Seconds to sleep between runs (multi_run mode).")
    return vars(parser.parse_args())


def main(handler, config):
    model = handler(config)
    metrics = model.exec_test() if config.get("test") else model.exec()
    print("[INFO] Metrics:", metrics)


def multi_run_main(handler, config, sleep=0):
    hyperparams = [k for k, v in config.items() if isinstance(v, list)]
    for cur_cfg in args_grid(config):
        print("\n")
        for k in hyperparams:
            if ignore_in_save_path(k, cur_cfg[k]):
                print(f"[info] `{k}` is ignored and will not be added to `save_path`.")
                continue
            abbr_key = convert_to_abbr(k)
            abbr_value = convert_to_abbr(cur_cfg[k])
            cur_cfg["save_path"] += f"-{abbr_key}_{abbr_value}"
            if cur_cfg.get("test"):
                cur_cfg["test_save_path"] += f"-{abbr_key}_{abbr_value}"
        model = handler(cur_cfg)
        metrics = model.exec_test() if cur_cfg.get("test") else model.exec()
        time.sleep(sleep)
        print("[INFO] Metrics:", metrics)


def apply_platform_config(config):
    """Honor `jax_platforms` / `jax_num_cpu_devices` config keys before any
    device is touched (some environments pin the platform in sitecustomize,
    so the JAX_PLATFORMS env var alone is not enough)."""
    if config.get("jax_platforms"):
        import jax
        jax.config.update("jax_platforms", str(config["jax_platforms"]))
        if config.get("jax_num_cpu_devices"):
            jax.config.update("jax_num_cpu_devices",
                              int(config["jax_num_cpu_devices"]))
    # multi-host bring-up (must precede any device use): `distributed: auto`
    # or an explicit {coordinator_address, num_processes, process_id} dict
    from vlsa_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed(config)


if __name__ == "__main__":
    cli = get_args()
    config = load_config(cli["config"])
    apply_platform_config(config)
    print_config(config)
    handler = {"SA": SAHandler, "VLSA": VLSAHandler, "CLF": CLFHandler}[cli["handler"]]
    if cli["multi_run"]:
        multi_run_main(handler, config, sleep=cli["sleep"])
    else:
        main(handler, config)
