"""ctypes bridge to the native C++ bag loader (native/bagloader.cpp).

Compiles the shared library on first use (g++, cached under
native/build/) and falls back to the pure-numpy path when no toolchain is
available.  Used by `BagBatcher` for `.npy` feature stores — the TPU-friendly
on-disk format produced by `vlsa_tpu.data.convert` from the reference's
torch `.pt` blobs (SURVEY.md §7.3 "Host-side data path").

Replaces torch dataloader workers (ref dataset/patchwsi.py read path) with a native c++ batch assembler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libbagloader.so")
_SRC = os.path.join(_NATIVE_DIR, "bagloader.cpp")

_lib = None
_lib_failed = False


def _build_lib() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC):
        return _SO_PATH
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO_PATH, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        print(f"[native_loader] build failed, falling back to numpy ({exc})")
        return None


def get_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    so = _build_lib()
    if so is None:
        _lib_failed = True
        return None
    lib = ctypes.CDLL(so)
    lib.bl_read_npy_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
                                     ctypes.POINTER(ctypes.c_long)]
    lib.bl_read_npy_info.restype = ctypes.c_int
    lib.bl_load_bag.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                ctypes.c_long, ctypes.c_long]
    lib.bl_load_bag.restype = ctypes.c_long
    lib.bl_assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_long), ctypes.c_int,
    ]
    lib.bl_assemble_batch.restype = ctypes.c_int
    lib.bl_read_q8_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
                                    ctypes.POINTER(ctypes.c_long)]
    lib.bl_read_q8_info.restype = ctypes.c_int
    lib.bl_assemble_q8_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_long), ctypes.c_int,
    ]
    lib.bl_assemble_q8_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def assemble_batch(path_groups: List[List[str]], target_n: int, dim: int,
                   n_threads: int = 8):
    """Threaded native assembly of one padded batch.

    path_groups: per bag, the list of .npy slide files (concatenated in order).
    Returns (feats [B, target_n, dim] f32, mask [B, target_n] bool, lens [B]).
    """
    lib = get_lib()
    assert lib is not None, "native loader unavailable"
    B = len(path_groups)
    feats = np.empty((B, target_n, dim), np.float32)
    mask = np.empty((B, target_n), np.uint8)
    lens = np.empty((B,), np.int64)
    joined = [";".join(g).encode() for g in path_groups]
    arr = (ctypes.c_char_p * B)(*joined)
    rc = lib.bl_assemble_batch(
        arr, B, target_n, dim,
        feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads)
    if rc != 0:
        raise IOError(f"native batch assembly failed with code {rc}")
    return feats, mask.astype(bool), lens


def read_npy_info(path: str):
    lib = get_lib()
    assert lib is not None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    rc = lib.bl_read_npy_info(path.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"cannot parse npy header of {path} (rc={rc})")
    return int(rows.value), int(cols.value)


def read_q8_info(path: str):
    """(rows, cols) of a .q8npz pre-quantized store's q member."""
    lib = get_lib()
    assert lib is not None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    rc = lib.bl_read_q8_info(path.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"cannot parse q8npz {path} (rc={rc})")
    return int(rows.value), int(cols.value)


def assemble_q8_batch(path_groups: List[List[str]], target_n: int, dim: int,
                      n_threads: int = 8):
    """Threaded native assembly of one padded int8 batch from `.q8npz`
    stores (uncompressed npz zip members parsed directly in C++).

    Returns (q [B, target_n, dim] int8, scale [B, target_n] f32,
    inv [B, target_n] f32, mask [B, target_n] bool, lens [B])."""
    lib = get_lib()
    assert lib is not None, "native loader unavailable"
    B = len(path_groups)
    q = np.empty((B, target_n, dim), np.int8)
    scale = np.empty((B, target_n), np.float32)
    inv = np.empty((B, target_n), np.float32)
    mask = np.empty((B, target_n), np.uint8)
    lens = np.empty((B,), np.int64)
    joined = [";".join(g).encode() for g in path_groups]
    arr = (ctypes.c_char_p * B)(*joined)
    rc = lib.bl_assemble_q8_batch(
        arr, B, target_n, dim,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads)
    if rc != 0:
        raise IOError(f"native q8 batch assembly failed with code {rc}")
    return q, scale, inv, mask.astype(bool), lens
