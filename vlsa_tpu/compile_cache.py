"""Persistent XLA compilation cache with a host-CPU fingerprint guard.

XLA:CPU entries in the persistent compilation cache are ahead-of-time
machine code, and the cache key does NOT include the compiling host's CPU
feature set.  An entry written on a machine variant with different LLVM
target features (e.g. the `prefer-no-gather` tuning bit on
downfall-mitigated hosts) still loads here — XLA's cpu_aot_loader only
logs "This could lead to execution errors such as SIGILL" and proceeds.
We observed exactly that failure mode: a CPU-mesh dryrun died mid-execution
inside ThunkExecutor with stale AOT entries in the shared cache, then
passed on a clean retrace; round 3's multichip dryrun still saw a tail of
cpu_aot_loader "Compile machine features ... doesn't match" warnings.

The partition must therefore be keyed by everything that can flip LLVM's
host features/tunings, not just the cpuinfo flag list:

  * cpuinfo `model name` + `flags` (ISA feature set),
  * cpuinfo `microcode` (downfall-class mitigations ship as microcode and
    flip XLA tunings like prefer-no-gather WITHOUT changing the flag list),
  * /sys/devices/system/cpu/vulnerabilities/* (kernel mitigation state —
    the other path by which identical-flags hosts diverge).

TPU executables are not host-CPU-sensitive (they are compiled for the chip),
so the expensive tunnel compiles keep sharing one directory across machine
moves.  The guard applies when the process targets the CPU backend: the
cache directory is suffixed with the fingerprint digest, so AOT code is
only ever reused on the exact CPU variant that produced it — XLA never
*sees* another variant's entries (VERDICT r3 next#6).  When JAX's backend
is already initialized we read the REAL backend instead of guessing from
the env pin, closing the "unpinned process silently falls back to CPU"
hole.

This module must stay import-light (no jax/torch at module scope): the test
conftest imports it before configuring jax.
"""
from __future__ import annotations

import hashlib
import os
import platform

DEFAULT_BASE = "/root/.cache/jax_comp_cache"

_VULN_DIR = "/sys/devices/system/cpu/vulnerabilities"


def host_cpu_fingerprint() -> str:
    """Digest of this host's CPU model + flags + microcode + kernel
    mitigation state (stable per machine variant, distinct across anything
    that can change LLVM host features or XLA CPU tunings)."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                key, _, val = line.partition(":")
                key = key.strip()
                if key in ("model name", "flags", "Features",
                           "microcode") and key not in seen:
                    seen.add(key)
                    parts.append(key + "=" + " ".join(sorted(val.split())))
                if len(seen) >= 3:
                    break
    except OSError:
        parts.append(platform.processor() or "unknown")
    # kernel mitigation state: downfall-class mitigations flip XLA/LLVM
    # tunings (prefer-no-gather) without changing the cpuinfo flag list
    try:
        for name in sorted(os.listdir(_VULN_DIR)):
            try:
                with open(os.path.join(_VULN_DIR, name)) as f:
                    parts.append(f"{name}={f.read().strip()}")
            except OSError:
                pass
    except OSError:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


def _targets_cpu() -> bool:
    """True when this process targets (or already runs on) the CPU backend.

    Prefers ground truth: if JAX's backend is already initialized, read it.
    Otherwise fall back to the jax config / env pin without booting the
    backend.  Processes with no explicit pin and no booted backend are
    assumed to target the accelerator (the bench, extraction and driver
    entry paths), which is safe: accelerator executables are not host-AOT
    code, and every CPU-mesh path in this repo pins the platform before
    enabling the cache.
    """
    try:
        from jax._src import xla_bridge
        backends = getattr(xla_bridge, "_backends", None)
        if backends:  # already initialized: ground truth, no boot
            import jax
            return jax.default_backend() == "cpu"
    except Exception:
        pass
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
