"""Guard the on-chip kernel validator's script logic on CPU.

scripts/validate_kernels_chip.py is the round-5 hardware-numerics gate
(KERNELS_CHIP.json + the bench `kernels_chip` lane).  Its chip findings
cannot be reproduced here, but the harness logic — path selection,
tolerance bookkeeping, exception isolation, the reduced-shape lane enter
point bench.py imports — must not rot in the CPU suite.  Interpreter mode
makes every kernel-vs-reference deviation ~f32-exact, so all checks must
come back ok.
"""
import numpy as np

import vlsa_tpu.ops.abmil as ab
import vlsa_tpu.ops.coattn as co


def _run(paths=None, **kw):
    import sys
    sys.path.insert(0, "scripts")
    from validate_kernels_chip import run_checks
    old_co, old_ab = co.INTERPRET, ab.INTERPRET
    co.INTERPRET = ab.INTERPRET = True
    try:
        return run_checks(paths=paths, **kw)
    finally:
        co.INTERPRET, ab.INTERPRET = old_co, old_ab


def test_run_checks_interpret_all_paths():
    res = _run(B=2, N=256, C=64, P=5, hid=16)
    for k in ("coattn_f32", "coattn_bf16", "coattn_int8",
              "abmil_f32", "abmil_q8"):
        assert res[k].get("ok"), (k, res[k])
        assert "error" not in res[k], res[k]
    assert res["ok"]


def test_run_checks_paths_subset():
    """The bench lane's subset call runs only the named paths."""
    res = _run(paths=["coattn_int8", "abmil_q8"], B=2, N=256, C=64, P=5,
               hid=16)
    assert res["ok"]
    assert "coattn_int8" in res and "abmil_q8" in res
    assert "coattn_f32" not in res and "abmil_f32" not in res


def test_dx_block_chain_fits_vmem_budget():
    """The dX-writing coattn backward double-buffers x IN and dx OUT;
    2*2*block*C*itemsize must stay under the 16 MB scoped-VMEM budget at
    the production C=512 (the f32/2048 choice exceeded it by 64K on a
    real v5e).  Same budget logic for the ABMIL f32 cap."""
    import jax.numpy as jnp
    for N in (10240, 2048, 4096, 102400):
        b32 = co._pick_block_dx(N, jnp.float32)
        b16 = co._pick_block_dx(N, jnp.bfloat16)
        assert b32 is None or 2 * 2 * b32 * 512 * 4 <= 16 * 1024 * 1024
        assert b16 is None or 2 * 2 * b16 * 512 * 2 <= 16 * 1024 * 1024
        a32 = ab.pick_block(N, jnp.float32)
        assert a32 is None or a32 <= 512
        ai8 = ab.pick_block(N, jnp.int8)
        assert ai8 is None or ai8 <= 2560
        ab16 = ab.pick_block(N, jnp.bfloat16)
        assert ab16 is None or ab16 <= 1280
        # chip-measured ceilings (round 5): int8 5120 compiles, 10240
        # exceeds scoped VMEM by 180K; bf16 caps at 2560; the fallback
        # chain must never exceed the dtype cap
        bi8 = co._pick_block(N, jnp.int8)
        assert bi8 is None or bi8 <= 5120
        bb16 = co._pick_block(N, jnp.bfloat16)
        assert bb16 is None or bb16 <= 2560
        bf32 = co._pick_block(N, jnp.float32)
        assert bf32 is None or bf32 <= 1024
