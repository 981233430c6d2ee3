"""Observability: structured metric logging, profiler traces, NaN debugging.

Fills SURVEY.md §5's absent-in-reference aux subsystems the TPU build owns:
  * JSONL metric log per run (alongside the printed metrics files),
  * jax.profiler traces (Perfetto-compatible) around training epochs when
    `profile_dir` is configured,
  * `debug_nans` flag flips jax_debug_nans for fail-fast numerical debugging.

Replaces the reference's wandb-only logging (ref runner/base_handler.py:85-105) with structured jsonl + profiling hooks.
"""
from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Optional


class JsonlLogger:
    """Append-only JSONL metrics log."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._fh = open(path, "a", buffering=1)

    def log(self, record: dict):
        record = dict(record)
        record.setdefault("ts", time.time())
        self._fh.write(json.dumps(record, default=float) + "\n")

    def close(self):
        self._fh.close()


@contextmanager
def maybe_profile(profile_dir: Optional[str], tag: str = "train"):
    """jax.profiler trace context when a directory is configured."""
    if not profile_dir:
        yield
        return
    import jax
    os.makedirs(profile_dir, exist_ok=True)
    with jax.profiler.trace(profile_dir):
        yield
    print(f"[profiler] wrote {tag} trace to {profile_dir}")


def configure_debug(cfg: dict):
    """Debug-mode toggles (host-level, before any compilation)."""
    import jax
    if cfg.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)
        print("[debug] jax_debug_nans enabled")
    if cfg.get("jax_disable_jit"):
        jax.config.update("jax_disable_jit", True)
        print("[debug] jit disabled")
