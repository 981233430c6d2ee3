"""Data-layer tests: label converter parity on the bundled TCGA-BLCA table,
split reading, few-shot sampling, and batch padding invariants."""
import numpy as np
import pytest

from vlsa_tpu.data import (
    MetaSurvData,
    read_file_data_splitting,
    SurvBagDataset,
    FewShotSurvBagDataset,
    BagBatcher,
)
from vlsa_tpu.data.label_converter import calculate_uncensored_time_bins

from conftest import reference_available, add_reference_to_path

TABLE = "assets/data_split/5foldcv/tcga_blca/mahmoodlab_tcga_blca_survival.csv"
SPLIT = "assets/data_split/5foldcv/tcga_blca/splits_0.csv"


def _meta(discrete=True):
    split = read_file_data_splitting(SPLIT)
    meta = MetaSurvData(TABLE, data_split=split, verbose=False)
    if discrete:
        meta.generate_discrete_label(num_bins=None, use_quantiles=False)
    return meta, split


def test_split_reader():
    split = read_file_data_splitting(SPLIT)
    assert "train" in split and "test" in split
    assert len(split["train"]) > len(split["test"])
    assert all(isinstance(p, str) for p in split["train"])


def test_discrete_label_shape():
    meta, split = _meta()
    assert meta.num_bins is not None
    labels = meta.get_patient_data(split="train", ret_columns=["y_t", "y_e"])
    assert labels.y_t.min() >= 0 and labels.y_t.max() < meta.num_bins


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_label_converter_parity():
    add_reference_to_path()
    from dataset.label_converter import MetaSurvData as RefMeta

    split = read_file_data_splitting(SPLIT)
    ref = RefMeta(TABLE, data_split=split, verbose=False)
    ref.generate_discrete_label(num_bins=None, use_quantiles=False, summary=False)
    meta, _ = _meta()
    np.testing.assert_allclose(meta.time_bins, ref.time_bins)
    np.testing.assert_array_equal(
        meta.pat_data["y_t"].values, ref.pat_data["y_t"].values)
    # KM-de-censored bins used by the few-shot sampler
    from dataset.label_converter import calculate_uncensored_time_bins as ref_ub
    pids = split["train"][:50]
    np.testing.assert_array_equal(
        calculate_uncensored_time_bins(pids, meta),
        ref_ub(pids, ref))


def test_bag_dataset_and_batcher_synthetic():
    meta, split = _meta()
    pids = split["train"][:10]
    ds = SurvBagDataset(pids, "synthetic://N=300,D=32,seed=1", "patch", meta)
    assert len(ds) == 10
    idx, (feats, _), label = ds[0]
    assert feats.shape[1] == 32 and label.shape == (2,)

    batcher = BagBatcher(ds, batch_size=4, shuffle=True, seed=0, min_bucket=64)
    batches = list(batcher)
    assert len(batches) == 3
    b0 = batches[0]
    assert b0["feats"].shape[0] == 4
    assert b0["feats"].shape[1] % 64 == 0
    # masks reflect true bag sizes
    assert b0["mask"].sum() > 0
    # tail batch has invalid padding rows
    assert batches[-1]["valid"].sum() == 2
    # bucket is power-of-two multiple of min
    n = b0["feats"].shape[1]
    assert (n & (n - 1)) == 0 or n % 64 == 0


def test_few_shot_dataset():
    meta, split = _meta()
    pids = split["train"][:80]
    ds = SurvBagDataset(pids, "synthetic://N=64,D=16,seed=2", "patch", meta)
    fs = FewShotSurvBagDataset(ds, num_shot=2, seed=0)
    assert len(fs) <= 2 * meta.num_bins
    events = np.array([fs.pid2label[u][1] for u in fs.uid])
    assert events.sum() >= 1
    idx, (feats, _), label = fs[0]
    assert feats.shape[1] == 16


def test_ratio_sampling():
    """Patient-level subsampling (ref utils/func.py:109-121 semantics):
    float = fraction, int = count; partition is exact."""
    from vlsa_tpu.data.bags import sampling_data
    np.random.seed(0)
    data = [f"P{i}" for i in range(10)]
    s, left = sampling_data(data, 0.3)
    assert len(s) == 3 and len(left) == 7 and not set(s) & set(left)
    s2, left2 = sampling_data(data, 4)
    assert len(s2) == 4 and sorted(s2 + left2) == sorted(data)


def test_bag_overflow_policy():
    """A bag larger than the bucket must raise by default (the reference
    uses every patch, ref dataset/PatchWSI.py:205-215); 'warn'/'truncate'
    opt into capping, counted on the batcher."""
    from vlsa_tpu.data.pipeline import BagOverflowError, pad_bag

    meta, split = _meta()
    pids = split["train"][:4]
    ds = SurvBagDataset(pids, "synthetic://N=300,D=8,seed=1", "patch", meta)

    with pytest.raises(BagOverflowError):
        list(BagBatcher(ds, batch_size=4, fixed_bucket=128))

    b = BagBatcher(ds, batch_size=4, fixed_bucket=128, overflow="warn")
    batches = list(b)
    assert batches[0]["feats"].shape[1] == 128
    assert b.truncated_bags == 4
    assert b.truncated_patches > 0

    # no overflow -> no complaint, counters stay zero (bags concatenate all
    # slides of a patient, so size up to n_slides * 450 here)
    b2 = BagBatcher(ds, batch_size=4, fixed_bucket=2048)
    list(b2)
    assert b2.truncated_bags == 0

    with pytest.raises(BagOverflowError):
        pad_bag(np.zeros((10, 4), np.float32), 8)
    f, m = pad_bag(np.zeros((10, 4), np.float32), 8, overflow="truncate")
    assert f.shape == (8, 4) and m.all()


def test_graph_pt_conversion(tmp_path):
    """Reference torch_geometric .pt graphs (ref dataset/PatchWSI.py:231-249)
    convert to .npz edge lists without torch_geometric installed — both the
    PatchGCN-era tg1 layout and the tg2 `_store` layout."""
    import torch
    from vlsa_tpu.data.convert import (
        _install_tg_unpickle_stubs, convert_graph_dir)

    _install_tg_unpickle_stubs()
    import torch_geometric.data.data as tgd
    import torch_geometric.data.storage as tgs

    src = tmp_path / "graphs"
    src.mkdir()
    rng = np.random.default_rng(0)
    ei = rng.integers(0, 50, size=(2, 120))

    # tg1 style: attrs directly on the Data object
    g1 = tgd.Data.__new__(tgd.Data)
    g1.__dict__.update({
        "x": torch.zeros(50, 8),
        "edge_index": torch.tensor(ei),
        "edge_latent": torch.tensor(ei[:, :40]),
        "centroid": torch.zeros(50, 2),
    })
    torch.save(g1, str(src / "S1-slide.pt"))

    # tg2 style: attrs behind _store._mapping
    store = tgs.GlobalStorage.__new__(tgs.GlobalStorage)
    store.__dict__["_mapping"] = {"x": torch.zeros(30, 8),
                                  "edge_index": torch.tensor(ei[:, :60])}
    g2 = tgd.Data.__new__(tgd.Data)
    g2.__dict__["_store"] = store
    torch.save(g2, str(src / "S2-slide.pt"))

    dst = tmp_path / "npz"
    n = convert_graph_dir(str(src), str(dst), verbose=False)
    assert n == 2
    z1 = np.load(dst / "S1-slide.npz")
    np.testing.assert_array_equal(z1["edge_index"], ei)
    assert "edge_latent" in z1
    z2 = np.load(dst / "S2-slide.npz")
    np.testing.assert_array_equal(z2["edge_index"], ei[:, :60])

    # converted graphs feed the graph-mode dataset end to end
    meta, split = _meta()
    pids = split["train"][:2]
    # name the graph files after this cohort's slide ids
    ds_probe = SurvBagDataset(pids, "synthetic://N=64,D=8,seed=1", "patch", meta)
    sids = [s for p in pids for s in ds_probe.pid2sids[p]]
    for s in sids:
        np.savez(dst / f"{s}.npz", edge_index=ei)
    ds = SurvBagDataset(pids, "synthetic://N=64,D=8,seed=1", "graph", meta,
                        graph_path=str(dst))
    _idx, (feats, edge_index), _label = ds[0]
    assert edge_index.shape[0] == 2 and edge_index.shape[1] >= 120
