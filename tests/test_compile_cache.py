"""Machine-fingerprinted persistent compile cache (vlsa_tpu/compile_cache.py).

Stale cross-machine XLA:CPU AOT entries can SIGILL mid-execution; CPU-pinned
processes must therefore use a per-CPU-variant cache directory while
accelerator processes keep the shared one.
"""
import os

import jax

from vlsa_tpu import compile_cache as cc


def test_fingerprint_stable_and_short():
    a, b = cc.host_cpu_fingerprint(), cc.host_cpu_fingerprint()
    assert a == b
    assert len(a) == 10
    int(a, 16)  # hex digest


def test_cpu_pinned_process_gets_fingerprinted_dir():
    # the test conftest pins jax_platforms=cpu, so this process IS the
    # dangerous case: the dir must be per-CPU-variant
    d = cc.cache_dir_for("/tmp/base_cache")
    assert d == f"/tmp/base_cache-cpu-{cc.host_cpu_fingerprint()}"


def test_accelerator_process_keeps_shared_dir(monkeypatch):
    monkeypatch.setattr(cc, "_targets_cpu", lambda: False)
    assert cc.cache_dir_for("/tmp/base_cache") == "/tmp/base_cache"


def test_enable_compile_cache_applies(tmp_path):
    base = str(tmp_path / "cache")
    prev = jax.config.jax_compilation_cache_dir
    try:
        cc.enable_compile_cache(base, min_secs=2.0)
        got = jax.config.jax_compilation_cache_dir
        assert got.startswith(base)
        assert got.endswith(cc.host_cpu_fingerprint())
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_conftest_cache_dir_is_fingerprinted():
    # the live test session must already be protected
    assert jax.config.jax_compilation_cache_dir.endswith(
        cc.host_cpu_fingerprint())
    assert os.environ.get("JAX_PLATFORMS") == "cpu"
