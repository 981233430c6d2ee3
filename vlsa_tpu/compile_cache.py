"""Persistent XLA compilation cache with a host-CPU fingerprint guard.

XLA:CPU entries in the persistent compilation cache are ahead-of-time
machine code, and the cache key does NOT include the compiling host's CPU
feature set.  An entry written on a machine variant with different LLVM
target features (e.g. the `prefer-no-gather` tuning bit on
downfall-mitigated hosts) still loads here — XLA's cpu_aot_loader only
logs "This could lead to execution errors such as SIGILL" and proceeds.
We observed exactly that failure mode: a CPU-mesh dryrun died mid-execution
inside ThunkExecutor with stale AOT entries in the shared cache, then
passed on a clean retrace.

TPU executables are not host-CPU-sensitive (they are compiled for the chip),
so the expensive tunnel compiles should keep sharing one directory across
machine moves.  The guard therefore applies only when the process targets
the CPU backend: the cache directory is suffixed with a digest of
/proc/cpuinfo's model + feature flags, so AOT code is only ever reused on
the exact CPU variant that produced it.

This module must stay import-light (no jax/torch at module scope): the test
conftest imports it before configuring jax.
"""
from __future__ import annotations

import hashlib
import os
import platform

DEFAULT_BASE = "/root/.cache/jax_comp_cache"


def host_cpu_fingerprint() -> str:
    """Digest of this host's CPU model + feature flags (stable per variant)."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    key, _, val = line.partition(":")
                    parts.append(key.strip() + "=" +
                                 " ".join(sorted(val.split())))
                if len(parts) >= 3:
                    break
    except OSError:
        parts.append(platform.processor() or "unknown")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


def _targets_cpu() -> bool:
    """True when this process is pinned to the CPU backend.

    Reads the jax config / env pin without booting the backend.  Processes
    with no explicit pin are assumed to target the accelerator (the bench,
    extraction and driver entry paths), which is safe: accelerator
    executables are not host-AOT code.
    """
    try:
        import jax
        val = getattr(jax.config, "jax_platforms", None)
    except Exception:
        val = None
    val = val or os.environ.get("JAX_PLATFORMS", "")
    return str(val).split(",")[0].strip().lower() == "cpu"


def cache_dir_for(base: str = DEFAULT_BASE) -> str:
    """`base` for accelerator processes; a per-CPU-variant dir for CPU ones."""
    if _targets_cpu():
        return f"{base}-cpu-{host_cpu_fingerprint()}"
    return base


def enable_compile_cache(base: str | None = None,
                         min_secs: float = 5.0) -> None:
    """Point jax's persistent compilation cache at a machine-safe directory.

    Call AFTER any in-process platform pin (jax.config.update("jax_platforms",
    ...)) so the CPU guard sees the final target.
    """
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir_for(base or DEFAULT_BASE))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
    except Exception:
        pass
