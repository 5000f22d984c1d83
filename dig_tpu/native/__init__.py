"""Native (C++) host-side components, loaded via ctypes.

The reference's native code is ``dig/lsgraph/method/GraphFMOB/csrc/``
(pybind11 torch extensions: one-hop relabel + async CUDA embedding IO).
Here native code serves the *host-side* graph machinery — partitioning,
halo/relabel index building, CSR utilities — while all device compute is
XLA/Pallas. Build with ``python -m dig_tpu.native.build`` (g++, no deps).

Every entry point degrades gracefully: when ``libdig_native.so`` is absent
the numpy fallbacks in ``dig_tpu.parallel.partition`` are used.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    for name in ("libdig_native.so",):
        path = os.path.join(here, name)
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.dig_partition.restype = ctypes.c_int
                lib.dig_partition.argtypes = [
                    ctypes.POINTER(ctypes.c_int64),  # rowptr
                    ctypes.POINTER(ctypes.c_int64),  # col
                    ctypes.c_int64,                  # num_nodes
                    ctypes.c_int64,                  # num_parts
                    ctypes.POINTER(ctypes.c_int64),  # out part_of
                ]
                lib.dig_relabel_one_hop.restype = ctypes.c_int64
                lib.dig_relabel_one_hop.argtypes = [
                    ctypes.POINTER(ctypes.c_int64),  # rowptr
                    ctypes.POINTER(ctypes.c_int64),  # col
                    ctypes.POINTER(ctypes.c_int64),  # idx (batch nodes)
                    ctypes.c_int64,                  # num_idx
                    ctypes.c_int64,                  # num_nodes
                    ctypes.POINTER(ctypes.c_int64),  # out rowptr
                    ctypes.POINTER(ctypes.c_int64),  # out col
                    ctypes.POINTER(ctypes.c_int64),  # out n_id
                    ctypes.c_int64,                  # max_out_edges
                    ctypes.c_int64,                  # max_out_nodes
                ]
                _LIB = lib
            except OSError:
                _LIB = None
            return _LIB
    return None


def available() -> bool:
    return _load() is not None


def _to_csr(senders: np.ndarray, receivers: np.ndarray, num_nodes: int):
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    order = np.argsort(senders, kind="stable")
    col = np.ascontiguousarray(receivers[order])
    deg = np.bincount(senders, minlength=num_nodes)
    rowptr = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(deg, out=rowptr[1:])
    return rowptr, col


def metis_partition(senders, receivers, num_nodes: int,
                    num_parts: int) -> Optional[np.ndarray]:
    """Balanced k-way partition via the C++ GGGP+FM partitioner.

    Returns part_of[num_nodes] or None when the native lib is unavailable
    (caller falls back to the numpy partitioner).
    """
    lib = _load()
    if lib is None:
        return None
    rowptr, col = _to_csr(senders, receivers, num_nodes)
    out = np.zeros(num_nodes, np.int64)
    p64 = ctypes.POINTER(ctypes.c_int64)
    rc = lib.dig_partition(
        rowptr.ctypes.data_as(p64), col.ctypes.data_as(p64),
        ctypes.c_int64(num_nodes), ctypes.c_int64(num_parts),
        out.ctypes.data_as(p64))
    if rc != 0:
        return None
    return out


def relabel_one_hop(senders, receivers, idx, num_nodes: int,
                    max_out_edges: Optional[int] = None,
                    max_out_nodes: Optional[int] = None):
    """C++ one-hop subgraph extraction + relabel (reference semantics:
    ``csrc/cpu/relabel_cpu.cpp:5-102`` — batch nodes first, out-of-batch
    neighbors appended after). Returns (out_rowptr, out_col, n_id) or None.
    """
    lib = _load()
    if lib is None:
        return None
    rowptr, col = _to_csr(senders, receivers, num_nodes)
    idx = np.ascontiguousarray(np.asarray(idx, np.int64))
    B = len(idx)
    moe = int(max_out_edges or len(col))
    mon = int(max_out_nodes or num_nodes)
    out_rowptr = np.zeros(B + 1, np.int64)
    out_col = np.zeros(moe, np.int64)
    out_nid = np.zeros(mon, np.int64)
    p64 = ctypes.POINTER(ctypes.c_int64)
    n_out = lib.dig_relabel_one_hop(
        rowptr.ctypes.data_as(p64), col.ctypes.data_as(p64),
        idx.ctypes.data_as(p64), ctypes.c_int64(B), ctypes.c_int64(num_nodes),
        out_rowptr.ctypes.data_as(p64), out_col.ctypes.data_as(p64),
        out_nid.ctypes.data_as(p64), ctypes.c_int64(moe), ctypes.c_int64(mon))
    if n_out < 0:
        return None
    ne = int(out_rowptr[B])
    return out_rowptr, out_col[:ne], out_nid[:int(n_out)]
