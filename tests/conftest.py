"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware (simulating a v5e-8
mesh), and make /root/reference importable for guarded parity tests.

Note: the environment may pre-import jax with a TPU plugin (JAX_PLATFORMS set
in the shell), so we must override via jax.config, not just env vars.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the quick tier is dominated by XLA:CPU
# compiles of the jitted train/eval engines (the synthetic cohorts are
# cheap), so re-runs hit the cache keyed on the HLO hash — code changes
# invalidate exactly the programs they change.
# The directory is suffixed with a host-CPU fingerprint: CPU entries are
# AOT machine code, and reusing them across machine variants can SIGILL
# (vlsa_tpu/compile_cache.py).
from vlsa_tpu.compile_cache import cache_dir_for  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  cache_dir_for(os.environ.get(
                      "VLSA_TPU_TEST_CACHE",
                      "/root/.cache/jax_test_comp_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
