"""Feature-store converter: torch `.pt` / `.h5` bags -> `.npy` (f32 or f16).

The reference stores CONCH features as torch `.pt` tensors
(ref utils/io.py:16-42); on TPU hosts `.npy` is the friendlier format — the
native loader (native/bagloader.cpp) reads it without Python or torch in the
loop.  Usage:

    python -m vlsa_tpu.data.convert --src <pt_dir> --dst <npy_dir> [--f16]
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np

from .io import read_patch_data


def convert_dir(src: str, dst: str, f16: bool = False, verbose: bool = True):
    os.makedirs(dst, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(src)):
        stem, ext = osp.splitext(fname)
        if ext not in (".pt", ".h5", ".npy"):
            continue
        arr = read_patch_data(osp.join(src, fname)).astype(
            np.float16 if f16 else np.float32)
        np.save(osp.join(dst, stem + ".npy"), arr)
        n += 1
        if verbose and n % 100 == 0:
            print(f"[convert] {n} files...")
    if verbose:
        print(f"[convert] wrote {n} .npy files to {dst}")
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--f16", action="store_true", help="store as float16")
    args = ap.parse_args()
    convert_dir(args.src, args.dst, f16=args.f16)
