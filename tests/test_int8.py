"""int8 feature storage: per-patch symmetric quantization end to end.

Opt-in `feats_dtype: int8` quarters the coattn kernels' HBM stream vs f32
(halves vs the recommended bf16).  The kernels consume the quantized form
directly — normalised attention logits are invariant to the per-patch scale
(ops/coattn.py), so parity vs an f32 reference on the SAME dequantized data
must be tight; the quantization error itself is the user's opt-in tradeoff.
No reference counterpart (the reference streams f32 torch tensors,
ref dataset/PatchWSI.py:205-229).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vlsa_tpu.data.pipeline import BagBatcher, quantize_feats_int8
from vlsa_tpu.models import VLFAN
from vlsa_tpu.models.vlsa import VLSA
import vlsa_tpu.ops.coattn as co


def _quantized_bag(B=2, N=256, C=64, P=5, seed=0):
    rng = np.random.default_rng(seed)
    x_f = rng.normal(size=(B, N, C)).astype(np.float32)
    mask = np.asarray(rng.random((B, N)) > 0.2)
    x_f[~mask] = 0.0
    x_i, s = quantize_feats_int8(x_f)
    q = rng.normal(size=(P, C)).astype(np.float32)
    x_deq = x_i.astype(np.float32) * s[..., None]
    return q, x_i, s, x_deq, mask


def test_quantize_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 32, 16)).astype(np.float32) * 5
    x[1, 10:] = 0.0  # padding rows
    q, s = quantize_feats_int8(x)
    assert q.dtype == np.int8 and s.dtype == np.float32
    # zero rows quantize to scale 0 (and exact zeros)
    assert (s[1, 10:] == 0).all() and (q[1, 10:] == 0).all()
    # elementwise error bounded by half a quantization step
    err = np.abs(q.astype(np.float32) * s[..., None] - x)
    assert (err <= s[..., None] / 2 + 1e-7).all()


def test_batcher_emits_int8():
    from vlsa_tpu.data import (
        BagBatcher, MetaSurvData, SurvBagDataset, read_file_data_splitting)

    split = read_file_data_splitting(
        "assets/data_split/5foldcv/tcga_blca/splits_0.csv")
    meta = MetaSurvData(
        "assets/data_split/5foldcv/tcga_blca/mahmoodlab_tcga_blca_survival.csv",
        data_split=split, verbose=False)
    meta.generate_discrete_label(num_bins=None, use_quantiles=False)
    ds = SurvBagDataset(split["train"][:6],
                        "synthetic://N=100,D=16,seed=5", "patch", meta)
    batcher = BagBatcher(ds, batch_size=3, min_bucket=64, feats_dtype="int8")
    for b in batcher:
        assert b["feats"].dtype == np.int8
        assert b["feats_scale"].shape == b["mask"].shape
        assert b["feats_scale"].dtype == np.float32
        # padding rows carry zero scale
        assert (b["feats_scale"][~b["mask"]] == 0).all()
        # host-precomputed 1/l2norm of the int values rides along
        norms = np.linalg.norm(b["feats"].astype(np.float32), axis=-1)
        got = b["feats_inv"]
        assert got.dtype == np.float32
        np.testing.assert_allclose(got[norms > 0], 1.0 / norms[norms > 0],
                                   rtol=1e-6)
        assert (got[norms == 0] == 0).all()


def test_q8npz_store_roundtrip(tmp_path):
    """convert --dtype int8 -> .q8npz store -> dataset -> batcher: int8
    batches with on-disk sidecars, no per-epoch host quantization; metrics
    vs an f32-store run agree to quantization tolerance."""
    from vlsa_tpu.data import (
        BagBatcher, MetaSurvData, SurvBagDataset, read_file_data_splitting)
    from vlsa_tpu.data.convert import convert_dir
    from vlsa_tpu.data.io import read_quantized_feats, synthetic_bag

    split = read_file_data_splitting(
        "assets/data_split/5foldcv/tcga_blca/splits_0.csv")
    meta = MetaSurvData(
        "assets/data_split/5foldcv/tcga_blca/mahmoodlab_tcga_blca_survival.csv",
        data_split=split, verbose=False)
    meta.generate_discrete_label(num_bins=None, use_quantiles=False)
    pids = split["train"][:4]
    # materialise an f32 .npy store from synthetic bags, then convert
    src = tmp_path / "npy"
    src.mkdir()
    sids = [s for p in pids
            for s in meta.collect_info_by_pids(pids)[1][p]]
    for sid in sids:
        np.save(src / f"{sid}.npy", synthetic_bag(sid, "synthetic://N=100,D=16,seed=5"))
    dst = tmp_path / "q8"
    n = convert_dir(str(src), str(dst), dtype="int8", verbose=False)
    assert n == len(sids)

    qf = read_quantized_feats(str(dst / f"{sids[0]}.q8npz"))
    ref = np.load(src / f"{sids[0]}.npy")
    assert qf.q.dtype == np.int8
    np.testing.assert_allclose(qf.dequantize(), ref, atol=np.max(np.abs(ref)) / 120)
    np.testing.assert_allclose(
        qf.inv, 1.0 / np.linalg.norm(qf.q.astype(np.float32), axis=-1), rtol=1e-6)

    ds = SurvBagDataset(pids, str(dst), "patch", meta, read_format="q8npz")
    batcher = BagBatcher(ds, batch_size=2, min_bucket=64, feats_dtype="int8")
    saw = 0
    for b in batcher:
        saw += 1
        assert b["feats"].dtype == np.int8
        assert (b["feats_scale"][~b["mask"]] == 0).all()
        assert (b["feats_inv"][b["mask"]] > 0).all()
    assert saw == 2

    # a bf16 compute request on the same store dequantizes transparently
    batcher_bf = BagBatcher(ds, batch_size=2, min_bucket=64,
                            feats_dtype="bfloat16")
    b = next(iter(batcher_bf))
    import ml_dtypes
    assert b["feats"].dtype == ml_dtypes.bfloat16


def test_coattn_int8_kernel_parity():
    """Fused int8 kernels (interpret mode) vs the f32 reference on the SAME
    dequantized data: fwd and dQ-only backward."""
    old = co.INTERPRET
    co.INTERPRET = True
    try:
        q, x_i, s, x_deq, mask = _quantized_bag(N=512)
        scale = jnp.float32(30.0)
        out_k = co._coattn_pool_tpu_nodx_q8(
            jnp.asarray(q), jnp.asarray(x_i), jnp.asarray(s), None,
            jnp.asarray(mask), scale)
        out_r = co.coattn_pool_reference(
            jnp.asarray(q), jnp.asarray(x_deq), jnp.asarray(mask), 30.0)
        rel = float(jnp.max(jnp.abs(out_k - out_r)) / jnp.max(jnp.abs(out_r)))
        assert rel < 1e-3, rel

        dq_k = jax.grad(lambda q_: jnp.sum(co._coattn_pool_tpu_nodx_q8(
            q_, jnp.asarray(x_i), jnp.asarray(s), None, jnp.asarray(mask),
            scale) ** 2))(jnp.asarray(q))
        dq_r = jax.grad(lambda q_: jnp.sum(co.coattn_pool_reference(
            q_, jnp.asarray(x_deq), jnp.asarray(mask), 30.0) ** 2))(jnp.asarray(q))
        rel = float(jnp.max(jnp.abs(dq_k - dq_r)) / jnp.max(jnp.abs(dq_r)))
        assert rel < 2e-3, rel

        # host-precomputed inv norms: identical math, no in-kernel reduction
        from vlsa_tpu.data.pipeline import feats_inv_norms
        inv = jnp.asarray(feats_inv_norms(x_i))
        out_ki = co._coattn_pool_tpu_nodx_q8(
            jnp.asarray(q), jnp.asarray(x_i), jnp.asarray(s), inv,
            jnp.asarray(mask), scale)
        rel = float(jnp.max(jnp.abs(out_ki - out_r)) / jnp.max(jnp.abs(out_r)))
        assert rel < 1e-3, rel
        dq_ki = jax.grad(lambda q_: jnp.sum(co._coattn_pool_tpu_nodx_q8(
            q_, jnp.asarray(x_i), jnp.asarray(s), inv, jnp.asarray(mask),
            scale) ** 2))(jnp.asarray(q))
        rel = float(jnp.max(jnp.abs(dq_ki - dq_r)) / jnp.max(jnp.abs(dq_r)))
        assert rel < 2e-3, rel
    finally:
        co.INTERPRET = old


def test_coattn_bf16_host_inv_norms():
    """bf16 storage with host-precomputed 1/l2norms (feats_inv sidecar):
    identical results to the in-kernel reduction path."""
    old = co.INTERPRET
    co.INTERPRET = True
    try:
        from vlsa_tpu.data.pipeline import feats_inv_norms
        rng = np.random.default_rng(1)
        B, N, C, P = 2, 512, 64, 5
        q = jnp.asarray(rng.normal(size=(P, C)), jnp.float32)
        xb = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32).astype(jnp.bfloat16)
        mask = jnp.asarray(rng.random((B, N)) > 0.2)
        inv = jnp.asarray(feats_inv_norms(np.asarray(xb).astype(np.float32)))
        scale = jnp.float32(30.0)

        out_plain = co.coattn_pool(q, xb, mask, scale, use_pallas=True,
                                   x_stop_gradient=True)
        out_inv = co.coattn_pool(q, xb, mask, scale, use_pallas=True,
                                 x_stop_gradient=True, x_inv=inv)
        np.testing.assert_allclose(np.asarray(out_inv), np.asarray(out_plain),
                                   rtol=1e-5, atol=1e-6)
        dq_plain = jax.grad(lambda q_: jnp.sum(co.coattn_pool(
            q_, xb, mask, scale, use_pallas=True, x_stop_gradient=True) ** 2))(q)
        dq_inv = jax.grad(lambda q_: jnp.sum(co.coattn_pool(
            q_, xb, mask, scale, use_pallas=True, x_stop_gradient=True,
            x_inv=inv) ** 2))(q)
        np.testing.assert_allclose(np.asarray(dq_inv), np.asarray(dq_plain),
                                   rtol=1e-4, atol=1e-5)
    finally:
        co.INTERPRET = old


def test_coattn_int8_requires_stop_gradient():
    q, x_i, s, _x_deq, mask = _quantized_bag(N=128)
    with pytest.raises(AssertionError, match="stop_gradient"):
        co.coattn_pool(jnp.asarray(q), jnp.asarray(x_i), jnp.asarray(mask),
                       30.0, x_scale=jnp.asarray(s))
    with pytest.raises(AssertionError, match="x_scale"):
        co.coattn_pool(jnp.asarray(q), jnp.asarray(x_i), jnp.asarray(mask),
                       30.0, x_stop_gradient=True)


def test_vlfan_int8_matches_dequantized():
    """VLFAN fed (int8, x_scale) == VLFAN fed dequantized f32 features
    (XLA fallback path on CPU); with a feat projecter the module dequantizes
    to bf16 internally (looser tolerance)."""
    q, x_i, s, x_deq, mask = _quantized_bag(N=256, C=32, P=4)
    model = VLFAN(dim_in=32, dim_hid=16, use_feat_proj=False,
                  query="Parameter", num_query=4, query_pooling="mean")
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_deq),
                        jnp.asarray(mask))["params"]
    out_deq = model.apply({"params": params}, jnp.asarray(x_deq), jnp.asarray(mask))
    out_q8 = model.apply({"params": params}, jnp.asarray(x_i), jnp.asarray(mask),
                         x_scale=jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(out_q8), np.asarray(out_deq),
                               rtol=1e-4, atol=1e-5)

    proj = VLFAN(dim_in=32, dim_hid=16, use_feat_proj=True,
                 query="Parameter", num_query=4, query_pooling="mean")
    pp = proj.init(jax.random.PRNGKey(1), jnp.asarray(x_deq), jnp.asarray(mask))["params"]
    out_deq = proj.apply({"params": pp}, jnp.asarray(x_deq).astype(jnp.bfloat16),
                         jnp.asarray(mask))
    out_q8 = proj.apply({"params": pp}, jnp.asarray(x_i), jnp.asarray(mask),
                        x_scale=jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(out_q8), np.asarray(out_deq),
                               rtol=2e-2, atol=2e-2)


def test_vlsa_engine_int8_end_to_end():
    """TrainEngine + eval steps run with an int8 batch on a VLSA assembly
    (accepts_x_scale) AND on a plain SA model (engine-side dequant fallback);
    the VLSA loss matches the dequantized-f32 run to fp tolerance."""
    import optax
    from vlsa_tpu.losses import load_loss
    from vlsa_tpu.models import DeepMIL
    from vlsa_tpu.runner.engine import (
        TrainEngine, make_objective, make_output_converter)

    K, C = 4, 32
    rng = np.random.default_rng(0)
    text_feats = rng.normal(size=(K, C)).astype(np.float32)
    model = VLSA(mil_encoder=VLFAN(dim_in=C, dim_hid=16, use_feat_proj=False,
                                   query="Parameter", num_query=4,
                                   query_pooling="mean"),
                 pretrained_text_features=text_feats)
    q, x_i, s, x_deq, mask = _quantized_bag(B=4, N=128, C=C, P=4, seed=7)
    t = jnp.asarray(rng.integers(0, K, size=4), jnp.int32)
    e = jnp.asarray(rng.integers(0, 2, size=4), jnp.float32)
    base = {"mask": jnp.asarray(mask), "t": t, "e": e,
            "idx": jnp.arange(4, dtype=jnp.int32), "valid": jnp.ones((4,), bool)}
    batch_q8 = dict(base, feats=jnp.asarray(x_i), feats_scale=jnp.asarray(s))
    batch_f32 = dict(base, feats=jnp.asarray(x_deq))

    params = model.init(jax.random.PRNGKey(0), batch_f32["feats"],
                        base["mask"])["params"]
    tx = optax.sgd(0.0)  # lr 0: compare losses on identical params
    loss_fns = load_loss("sa", loss_type=["SurvIFMLE"], SurvIFMLE={})
    objective = make_objective(loss_fns, {"SurvIFMLE": 1.0},
                               make_output_converter("softmax"), uses_vl=True)
    eng = TrainEngine(model, tx, objective, uses_vl=True)
    key = jax.random.PRNGKey(1)
    _, _, loss_q8, _ = eng.train_step()(params, tx.init(params), batch_q8, key)
    _, _, loss_f32, _ = eng.train_step()(params, tx.init(params), batch_f32, key)
    np.testing.assert_allclose(float(loss_q8), float(loss_f32), rtol=1e-4)
    # eval step too
    out_q8 = eng.eval_step()(params, batch_q8)
    out_f32 = eng.eval_step()(params, batch_f32)
    np.testing.assert_allclose(np.asarray(out_q8), np.asarray(out_f32),
                               rtol=1e-3, atol=1e-4)

    # SA model without x_scale support: engine dequantizes to bf16 in-graph
    sa = DeepMIL(dim_in=C, dim_hid=16, num_cls=K, use_feat_proj=False,
                 pooling="attention")
    sp = sa.init(jax.random.PRNGKey(2), batch_f32["feats"], base["mask"])["params"]
    objective_sa = make_objective(loss_fns, {"SurvIFMLE": 1.0},
                                  make_output_converter("softmax"), uses_vl=False)
    eng_sa = TrainEngine(sa, tx, objective_sa, uses_vl=False)
    _, _, l_q8, _ = eng_sa.train_step()(sp, tx.init(sp), batch_q8, key)
    _, _, l_f32, _ = eng_sa.train_step()(sp, tx.init(sp), batch_f32, key)
    np.testing.assert_allclose(float(l_q8), float(l_f32), rtol=5e-3)


# ---------------------------------------------------------------------------
# ABMIL int8 kernels (VERDICT r2 #2: SA-family int8 lane)
# ---------------------------------------------------------------------------


def test_abmil_int8_kernel_parity():
    """Fused int8 ABMIL kernels (interpret mode) vs the f32 reference on the
    SAME dequantized data: fwd and the weight-grads-only backward."""
    from vlsa_tpu.ops import abmil as ab
    old = ab.INTERPRET
    ab.INTERPRET = True
    try:
        _q, x_i, s, x_deq, mask = _quantized_bag(N=512, C=64)
        rng = np.random.default_rng(7)
        hid = 32
        w1 = jnp.asarray(rng.normal(size=(hid, 64)).astype(np.float32) * 0.2)
        b1 = jnp.asarray(rng.normal(size=(hid,)).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.normal(size=(hid,)).astype(np.float32) * 0.3)

        out_k = ab._abmil_pool_tpu_q8(jnp.asarray(x_i), jnp.asarray(s),
                                      jnp.asarray(mask), w1, b1, w2)
        out_r, _ = ab.abmil_pool_reference(jnp.asarray(x_deq), jnp.asarray(mask),
                                           w1, b1, w2, jnp.float32(0.0))
        rel = float(jnp.max(jnp.abs(out_k - out_r)) / jnp.max(jnp.abs(out_r)))
        assert rel < 1e-3, rel

        def loss_k(w1_, b1_, w2_):
            return jnp.sum(ab._abmil_pool_tpu_q8(
                jnp.asarray(x_i), jnp.asarray(s), jnp.asarray(mask),
                w1_, b1_, w2_) ** 2)

        def loss_r(w1_, b1_, w2_):
            return jnp.sum(ab.abmil_pool_reference(
                jnp.asarray(x_deq), jnp.asarray(mask), w1_, b1_, w2_,
                jnp.float32(0.0))[0] ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(w1, b1, w2)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(w1, b1, w2)
        for name, a, b in zip(("dw1", "db1", "dw2"), gk, gr):
            denom = float(jnp.max(jnp.abs(b))) + 1e-12
            rel = float(jnp.max(jnp.abs(a - b))) / denom
            assert rel < 2e-3, (name, rel)
    finally:
        ab.INTERPRET = old


def test_abmil_pool_int8_xla_fallback_matches_dequantized():
    from vlsa_tpu.ops import abmil as ab
    _q, x_i, s, x_deq, mask = _quantized_bag(N=192, C=32)
    rng = np.random.default_rng(2)
    hid = 16
    w1 = jnp.asarray(rng.normal(size=(hid, 32)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.normal(size=(hid,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(hid,)).astype(np.float32) * 0.3)
    out_q8 = ab.abmil_pool(jnp.asarray(x_i), jnp.asarray(mask), w1, b1, w2,
                           jnp.float32(0.0), use_pallas=False,
                           x_scale=jnp.asarray(s))
    out_f = ab.abmil_pool(jnp.asarray(x_deq), jnp.asarray(mask), w1, b1, w2,
                          jnp.float32(0.0), use_pallas=False)
    np.testing.assert_allclose(np.asarray(out_q8), np.asarray(out_f),
                               rtol=1e-5, atol=1e-6)


def test_deepmil_int8_matches_dequantized():
    """DeepMIL fed (int8, x_scale) == DeepMIL fed dequantized features, for
    the raw-attention fast path AND the dequantize-first paths (feat_proj /
    mean pooling)."""
    from vlsa_tpu.models.mil import DeepMIL
    _q, x_i, s, x_deq, mask = _quantized_bag(N=256, C=32)
    for kws, tol in [
        (dict(use_feat_proj=False, pooling="attention"), 1e-5),
        (dict(use_feat_proj=True, pooling="attention"), 2e-2),
        (dict(use_feat_proj=False, pooling="mean"), 2e-2),
    ]:
        model = DeepMIL(dim_in=32, dim_hid=16, num_cls=4, drop_rate=0.0, **kws)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_deq),
                            jnp.asarray(mask))["params"]
        out_f = model.apply({"params": params}, jnp.asarray(x_deq),
                            jnp.asarray(mask))
        out_q8 = model.apply({"params": params}, jnp.asarray(x_i),
                             jnp.asarray(mask), x_scale=jnp.asarray(s))
        np.testing.assert_allclose(np.asarray(out_q8), np.asarray(out_f),
                                   rtol=tol, atol=tol, err_msg=str(kws))


@pytest.mark.slow
def test_int8_task_level_validation_smoke(tmp_path):
    """scripts/validate_int8.py --smoke: production-runner A/B (f32 store vs
    q8npz store) keeps the test C-index within 0.05 and the survival curves
    within 0.05 mean abs deviation (observed: 0.000 / <1e-3)."""
    import json
    import subprocess
    import sys
    import os.path as osp
    out = tmp_path / "int8_acc.json"
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "scripts/validate_int8.py", "--smoke",
         "--out", str(out)],
        capture_output=True, text=True, cwd=repo, timeout=1500)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    with open(out) as f:
        res = json.load(f)
    for task in ("sa_abmil", "vlsa"):
        assert res[task]["c_index_abs_dev"] <= 0.05, (task, res[task])
        assert res[task]["survival_curve_mean_abs_dev"] <= 0.05, (task, res[task])
