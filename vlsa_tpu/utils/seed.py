"""Determinism helpers (ref utils/func.py:178-209 seeds torch/np/random; here
the JAX PRNG is explicit, so we only seed host-side numpy/python RNGs)."""
from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    print(f"[setup] seed: {seed}")
