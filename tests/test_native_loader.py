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
