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


def test_fingerprint_tracks_mitigation_state(monkeypatch, tmp_path):
    """Two hosts with identical cpuinfo flags but different kernel
    mitigation state (the downfall / prefer-no-gather case that produced
    MULTICHIP_r03's cpu_aot_loader warnings) must get different dirs."""
    a = cc.host_cpu_fingerprint()
    vuln = tmp_path / "vulnerabilities"
    vuln.mkdir()
    (vuln / "gather_data_sampling").write_text(
        "Mitigation: Microcode\n")
    monkeypatch.setattr(cc, "_VULN_DIR", str(vuln))
    b = cc.host_cpu_fingerprint()
    assert a != b
    # and the partition follows the fingerprint
    assert cc.cache_dir_for("/tmp/x") == f"/tmp/x-cpu-{b}"


def test_initialized_backend_wins_over_env_pin(monkeypatch):
    """When the backend is already booted (this test session runs on CPU),
    the guard reads ground truth even if the env pin lies."""
    _ = jax.devices()  # ensure initialized
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert cc._targets_cpu()  # real backend is cpu despite no env pin


def test_foreign_cpu_aot_entries_never_reach_xla(tmp_path):
    """Simulate a cache base pre-populated by a DIFFERENT machine variant:
    a cpu-pinned subprocess enabling the cache on the same base must (a)
    never read the foreign dir (its dir name differs), (b) emit no
    cpu_aot_loader feature-mismatch warnings, and (c) write its own entries
    into this variant's dir only (VERDICT r3 next#6 'clean dryrun tail')."""
    import subprocess
    import sys

    base = str(tmp_path / "cache")
    foreign = base + "-cpu-0123456789"  # some other variant's partition
    os.makedirs(foreign)
    with open(os.path.join(foreign, "jit_f-deadbeef-cache"), "wb") as f:
        f.write(b"\x00garbage-aot-entry")
    code = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from vlsa_tpu.compile_cache import enable_compile_cache
enable_compile_cache({base!r}, min_secs=0.0)
import jax.numpy as jnp
print(float(jax.jit(lambda x: (x @ x.T).sum())(jnp.ones((64, 64)))))
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300, cwd=repo)
    assert out.returncode == 0, out.stderr[-2000:]
    combined = out.stdout + out.stderr
    assert "cpu_aot_loader" not in combined
    assert "doesn't match" not in combined
    mine = base + "-cpu-" + cc.host_cpu_fingerprint()
    assert os.path.isdir(mine)
    assert os.listdir(mine), "subprocess wrote no cache entries"
    # the foreign partition was never touched
    assert os.listdir(foreign) == ["jit_f-deadbeef-cache"]
