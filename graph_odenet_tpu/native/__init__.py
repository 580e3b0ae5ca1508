"""ctypes bindings for the native graph-builder (graphbuild.cpp).

``preprocess_edges`` mirrors the numpy pipeline in ``graph.from_edges``
(symmetrize → dedup → self-loops → (receiver, sender) sort → normalise) but
runs in C++ — the framework's native tier for OGBN-scale preprocessing.
Falls back transparently (returns None from ``load()``) when the .so hasn't
been built; ``graph.from_edges`` uses it automatically when present.

Build once per machine:  ``make -C graph_odenet_tpu/native``
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["load", "build", "preprocess_edges", "build_blocks"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgraphbuild.so")
_lib = None
_load_failed = False

_I64 = ctypes.POINTER(ctypes.c_int64)
_F64 = ctypes.POINTER(ctypes.c_double)


def build(quiet: bool = True) -> bool:
    """Compile the .so in place.  Returns success."""
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=quiet,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load(auto_build: bool = True):
    """Load (building on first use if needed).  None if unavailable."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not os.path.exists(_SO) and auto_build and not build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _load_failed = True
        return None
    lib.god_preprocess_edges.restype = ctypes.c_int64
    lib.god_preprocess_edges.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        _I64, _I64, _F64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64,
        _I64, _I64, _F64,
    ]
    lib.god_build_blocks.restype = None
    lib.god_build_blocks.argtypes = [
        ctypes.c_int64, _I64, ctypes.c_int64, ctypes.c_int64, _I64,
    ]
    _lib = lib
    return _lib


def _ptr(a, typ):
    return a.ctypes.data_as(typ)


def preprocess_edges(
    senders: np.ndarray,
    receivers: np.ndarray,
    n_node: int,
    *,
    weight: Optional[np.ndarray] = None,
    symmetrize: bool = True,
    add_self_loops: bool = True,
    normalize: Optional[str] = "row",
):
    """Native-path equivalent of the numpy pipeline in ``from_edges``.

    Returns ``(senders, receivers, weight)`` int64/int64/float64 arrays
    sorted by (receiver, sender), or None when the native library is
    unavailable.
    """
    lib = load()
    if lib is None:
        return None
    senders = np.ascontiguousarray(senders, dtype=np.int64)
    receivers = np.ascontiguousarray(receivers, dtype=np.int64)
    w = (
        np.ascontiguousarray(weight, dtype=np.float64)
        if weight is not None
        else None
    )
    e = senders.shape[0]
    cap = e * (2 if symmetrize else 1) + n_node
    out_s = np.empty(cap, dtype=np.int64)
    out_r = np.empty(cap, dtype=np.int64)
    out_w = np.empty(cap, dtype=np.float64)
    norm_code = {None: 0, "row": 1, "sym": 2}[normalize]
    n_out = lib.god_preprocess_edges(
        n_node, e,
        _ptr(senders, _I64), _ptr(receivers, _I64),
        _ptr(w, _F64) if w is not None else None,
        int(symmetrize), int(add_self_loops), norm_code,
        cap,
        _ptr(out_s, _I64), _ptr(out_r, _I64), _ptr(out_w, _F64),
    )
    if n_out < 0:
        return None
    return out_s[:n_out].copy(), out_r[:n_out].copy(), out_w[:n_out].copy()


def build_blocks(receivers: np.ndarray, block_rows: int, n_blocks: int):
    """CSR row-block pointers (receivers must be sorted)."""
    lib = load()
    if lib is None:
        return None
    receivers = np.ascontiguousarray(receivers, dtype=np.int64)
    blk_ptr = np.zeros(n_blocks + 1, dtype=np.int64)
    lib.god_build_blocks(
        receivers.shape[0], _ptr(receivers, _I64),
        block_rows, n_blocks, _ptr(blk_ptr, _I64),
    )
    return blk_ptr
