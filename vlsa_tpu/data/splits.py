"""Data-split readers (ref: utils/io.py:86-149)."""
from __future__ import annotations

import os.path as osp

import numpy as np
import pandas as pd


def infer_columns_for_splitting(available_columns):
    """Infer train/test/val columns by keyword (ref utils/io.py:86-105)."""
    ret = []
    for key in ("train", "test", "val"):
        target = None
        for c in available_columns:
            if key in c:
                target = c
        ret.append(target)
    train_col, test_col, val_col = ret
    if test_col is None:
        test_col = val_col
        val_col = None
    assert train_col is not None, "The column corresponding to `train` is not found."
    assert test_col is not None, "The column corresponding to `test` is not found."
    return train_col, test_col, val_col


def read_file_data_splitting(path: str) -> dict:
    """Read a .csv/.npz split file into {'train': [...], 'test': [...], ...}
    (ref utils/io.py:107-145)."""
    _, ext = osp.splitext(path)
    data_split = {}
    if ext == ".npz":
        data = np.load(path)
        cols = list(data.keys())
        get = lambda c: [str(s) for s in data[c]]
    elif ext == ".csv":
        data = pd.read_csv(path)
        cols = list(data.columns)
        get = lambda c: [str(s) for s in data[c].dropna()]
    else:
        raise ValueError(f"unsupported split file extension {ext}")
    train_col, test_col, val_col = infer_columns_for_splitting(cols)
    data_split["train"] = get(train_col)
    data_split["test"] = get(test_col)
    if val_col is not None:
        data_split["validation"] = get(val_col)
    return data_split


def read_maxt_from_table(path: str, at_column: str = "t") -> float:
    return pd.read_csv(path)[at_column].max()
