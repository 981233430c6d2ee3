"""Native C++ bag loader: npy parsing, threaded batch assembly, and
equivalence with the numpy path."""
import os

import numpy as np
import pytest

from vlsa_tpu.data.native_loader import (
    assemble_batch,
    native_available,
    read_npy_info,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain for native loader")

RNG = np.random.default_rng(4)


def test_read_info_and_assembly(tmp_path):
    dims = 32
    sizes = [50, 70, 20]
    paths = []
    arrays = []
    for i, n in enumerate(sizes):
        arr = RNG.normal(size=(n, dims)).astype(np.float32)
        p = str(tmp_path / f"bag{i}.npy")
        np.save(p, arr)
        arrays.append(arr)
        paths.append(p)

    assert read_npy_info(paths[0]) == (50, dims)

    # one bag per group + one multi-slide bag (concatenated)
    groups = [[paths[0]], [paths[1]], [paths[0], paths[2]]]
    feats, mask, lens = assemble_batch(groups, target_n=128, dim=dims)
    assert feats.shape == (3, 128, dims)
    np.testing.assert_array_equal(lens, [50, 70, 70])
    np.testing.assert_allclose(feats[0, :50], arrays[0])
    np.testing.assert_allclose(feats[2, :50], arrays[0])
    np.testing.assert_allclose(feats[2, 50:70], arrays[2])
    assert mask[0].sum() == 50 and not mask[0, 50:].any()
    assert (feats[0, 50:] == 0).all()


def test_float16_store(tmp_path):
    arr = RNG.normal(size=(10, 16)).astype(np.float16)
    p = str(tmp_path / "f16.npy")
    np.save(p, arr)
    feats, mask, lens = assemble_batch([[p]], target_n=16, dim=16)
    np.testing.assert_allclose(feats[0, :10], arr.astype(np.float32), rtol=1e-3)


def test_batcher_native_path_matches_numpy(tmp_path):
    """BagBatcher must produce identical batches via native and numpy paths."""
    import pandas as pd
    from vlsa_tpu.data import MetaSurvData, SurvBagDataset, BagBatcher

    rows = []
    for i in range(8):
        pid = f"P{i}"
        n = int(RNG.integers(20, 60))
        arr = RNG.normal(size=(n, 24)).astype(np.float32)
        np.save(tmp_path / f"{pid}-s.npy", arr)
        rows.append({"pathology_id": f"{pid}-s", "patient_id": pid,
                     "e": int(RNG.random() < 0.7), "t": float(RNG.uniform(5, 50))})
    table = tmp_path / "t.csv"
    pd.DataFrame(rows).to_csv(table, index=False)
    meta = MetaSurvData(str(table), verbose=False)
    meta.generate_discrete_label(num_bins=3, use_quantiles=False)
    pids = [r["patient_id"] for r in rows]
    ds = SurvBagDataset(pids, str(tmp_path), "patch", meta, read_format="npy")

    b_native = next(iter(BagBatcher(ds, batch_size=8, min_bucket=64, prefetch=0)))
    # force the numpy path by hiding bag_paths
    ds2 = SurvBagDataset(pids, str(tmp_path), "patch", meta, read_format="npy")
    ds2.bag_paths = lambda i: None
    b_numpy = next(iter(BagBatcher(ds2, batch_size=8, min_bucket=64, prefetch=0)))
    np.testing.assert_allclose(b_native["feats"], b_numpy["feats"])
    np.testing.assert_array_equal(b_native["mask"], b_numpy["mask"])
    np.testing.assert_array_equal(b_native["t"], b_numpy["t"])


def test_native_q8_info_and_assembly(tmp_path):
    """C++ .q8npz reader: zip64 member walk + int8/f32 members == the
    numpy reference read, incl. multi-slide concatenation and padding."""
    from vlsa_tpu.data.native_loader import (
        assemble_q8_batch, native_available, read_q8_info)
    from vlsa_tpu.data.pipeline import feats_inv_norms, quantize_feats_int8
    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    paths, qs, ss, invs = [], [], [], []
    for i, n in enumerate((37, 21)):
        f = rng.normal(size=(n, 16)).astype(np.float32)
        q, s = quantize_feats_int8(f)
        inv = feats_inv_norms(q)
        p = tmp_path / f"s{i}.q8npz"
        with open(p, "wb") as fh:
            np.savez(fh, q=q, scale=s, inv=inv)
        paths.append(str(p))
        qs.append(q); ss.append(s); invs.append(inv)

    assert read_q8_info(paths[0]) == (37, 16)

    # one bag = both slides concatenated; pad to 64
    q_b, s_b, i_b, mask, lens = assemble_q8_batch([paths], 64, 16)
    assert lens[0] == 58 and mask[0, :58].all() and not mask[0, 58:].any()
    np.testing.assert_array_equal(q_b[0, :37], qs[0])
    np.testing.assert_array_equal(q_b[0, 37:58], qs[1])
    np.testing.assert_array_equal(s_b[0, :37], ss[0])
    np.testing.assert_array_equal(i_b[0, 37:58], invs[1])
    assert (q_b[0, 58:] == 0).all() and (s_b[0, 58:] == 0).all()


def test_batcher_uses_native_q8_path(tmp_path):
    """BagBatcher with a .q8npz store + feats_dtype int8 produces identical
    batches through the native C++ path and the numpy path."""
    import pandas as pd
    from vlsa_tpu.data import BagBatcher, MetaSurvData, SurvBagDataset, \
        read_file_data_splitting
    from vlsa_tpu.data.pipeline import feats_inv_norms, quantize_feats_int8
    from vlsa_tpu.data import pipeline as pl
    from vlsa_tpu.data.native_loader import native_available
    if not native_available():
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(1)
    rows = []
    store = tmp_path / "feats"
    store.mkdir()
    for i in range(8):
        pid = f"P{i:03d}"
        sid = pid + "-slide"
        rows.append({"pathology_id": sid, "patient_id": pid,
                     "e": int(rng.random() < 0.7),
                     "t": round(float(rng.uniform(5, 80)), 2)})
        f = rng.normal(size=(int(rng.integers(20, 60)), 8)).astype(np.float32)
        q, s = quantize_feats_int8(f)
        with open(store / f"{sid}.q8npz", "wb") as fh:
            np.savez(fh, q=q, scale=s, inv=feats_inv_norms(q))
    table = tmp_path / "survival.csv"
    pd.DataFrame(rows).to_csv(table, index=False)
    pids = [r["patient_id"] for r in rows]
    split = tmp_path / "splits_0.csv"
    pd.DataFrame({"train": pd.Series(pids), "val": pd.Series(pids[:2])}
                 ).to_csv(split, index=False)

    sp = read_file_data_splitting(str(split))
    meta = MetaSurvData(str(table), data_split=sp, verbose=False)
    meta.generate_discrete_label(num_bins=3, use_quantiles=False)
    ds = SurvBagDataset(sp["train"], str(store), "patch", meta,
                        read_format="q8npz")

    def batches(native_on):
        orig = pl.BagBatcher._try_native_batch
        if not native_on:
            pl.BagBatcher._try_native_batch = lambda self, idx: None
        try:
            b = BagBatcher(ds, batch_size=4, shuffle=False, min_bucket=64,
                           feats_dtype="int8", prefetch=0)
            return list(b)
        finally:
            pl.BagBatcher._try_native_batch = orig

    nat = batches(True)
    ref = batches(False)
    assert len(nat) == len(ref) >= 2
    for bn, br in zip(nat, ref):
        assert set(bn.keys()) == set(br.keys()), (bn.keys(), br.keys())
        assert bn["feats"].dtype == np.int8
        for k in bn:
            np.testing.assert_array_equal(bn[k], br[k], err_msg=k)
