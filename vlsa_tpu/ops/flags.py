"""Trace-time kernel routing flags.

`disable_pallas()` scopes the fused-Pallas eligibility checks off for
whatever tracing happens inside the `with` block — the per-call override
that the process-global `VLSA_TPU_DISABLE_PALLAS=1` env knob cannot
provide.  The primary user is the adahessian train step: its Hutchinson
estimate runs forward-over-reverse (`jax.jvp(jax.grad(...))`), and
`jax.custom_vjp` functions — every fused Pallas kernel — have no JVP rule,
so that one step must trace the XLA reference path while everything else
in the process (other grid runs, eval, extraction) keeps the kernels.

The checks read this at TRACE time; wrapping every call of a jitted
function keeps correctness (retraces see the same value) at the cost of a
context-manager enter/exit per call.
"""
from __future__ import annotations

import os
from contextlib import contextmanager

_depth = 0


@contextmanager
def disable_pallas():
    """Scope the fused-kernel eligibility checks to False."""
    global _depth
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1


def pallas_disabled() -> bool:
    """True when fused Pallas kernels must not be traced (scoped override
    or the VLSA_TPU_DISABLE_PALLAS=1 env knob)."""
    return _depth > 0 or os.environ.get("VLSA_TPU_DISABLE_PALLAS") == "1"
