"""CSR graph construction + native random-walk sampling.

Python frontend of ``csrc/walker.cpp`` (built on demand with g++, cached),
with a numpy fallback for environments without a compiler.  Replaces
csrgraph/nodevectors in the node2vec pipeline
(reference ``/root/reference/src/stonkgs/models/node2vec.py:291-334``).
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


@dataclasses.dataclass
class CSRGraph:
    """Undirected (symmetrized) CSR graph over named nodes."""

    names: List[str]
    indptr: np.ndarray   # (N+1,) int64
    indices: np.ndarray  # (E,) int32, sorted within each row

    @property
    def n_nodes(self) -> int:
        return len(self.names)

    @classmethod
    def from_edges(cls, sources: Sequence[str], targets: Sequence[str],
                   directed: bool = False) -> "CSRGraph":
        """Build from name pairs; node ids by first appearance
        (csrgraph ``read_edgelist`` keeps insertion order)."""
        name_to_id = {}
        src_ids = np.empty(len(sources), np.int32)
        tgt_ids = np.empty(len(targets), np.int32)
        for i, (s, t) in enumerate(zip(sources, targets)):
            src_ids[i] = name_to_id.setdefault(s, len(name_to_id))
            tgt_ids[i] = name_to_id.setdefault(t, len(name_to_id))
        n = len(name_to_id)
        if directed:
            rows, cols = src_ids, tgt_ids
        else:
            rows = np.concatenate([src_ids, tgt_ids])
            cols = np.concatenate([tgt_ids, src_ids])
        order = np.lexsort((cols, rows))
        rows, cols = rows[order], cols[order]
        indptr = np.zeros(n + 1, np.int64)
        np.add.at(indptr, rows + 1, 1)
        indptr = np.cumsum(indptr)
        return cls(list(name_to_id), indptr, cols.astype(np.int32))


_lib = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.abspath(os.path.join(_CSRC, "walker.cpp"))
    build_dir = os.path.join(os.path.dirname(src), "build")
    so = os.path.join(build_dir, "libwalker.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            os.makedirs(build_dir, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 "-o", so, src],
                check=True, capture_output=True,
            )
        _lib = ctypes.CDLL(so)
        _lib.random_walks.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_uint64, ctypes.c_double, ctypes.c_double,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        _lib.random_walks.restype = None
    except (subprocess.CalledProcessError, OSError, FileNotFoundError):
        _lib = None
    return _lib


def random_walks(
    graph: CSRGraph,
    walk_len: int = 127,
    epochs: int = 4,
    seed: int = 0,
    p: float = 1.0,
    q: float = 1.0,
    n_threads: Optional[int] = None,
) -> np.ndarray:
    """(epochs * n_nodes, walk_len) int32 walk matrix, epoch-major.

    Epoch e row i starts at node i (nodevectors semantics: one walk per
    node per epoch)."""
    n = graph.n_nodes
    out = np.empty((epochs * n, walk_len), np.int32)
    lib = _load_lib()
    if lib is not None:
        threads = n_threads or os.cpu_count() or 1
        lib.random_walks(
            graph.indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            graph.indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, walk_len, epochs, seed, p, q, threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
    return _numpy_walks(graph, walk_len, epochs, seed, p, q, out)


def _numpy_walks(graph, walk_len, epochs, seed, p, q, out) -> np.ndarray:
    """Pure-numpy fallback (1st-order vectorized; 2nd-order per step)."""
    rng = np.random.default_rng(seed)
    n = graph.n_nodes
    deg = np.diff(graph.indptr)
    assert p == 1.0 and q == 1.0, "numpy fallback supports p=q=1 only"
    for e in range(epochs):
        cur = np.arange(n, dtype=np.int64)
        out[e * n:(e + 1) * n, 0] = cur
        for t in range(1, walk_len):
            d = deg[cur]
            off = (rng.random(n) * np.maximum(d, 1)).astype(np.int64)
            nxt = graph.indices[graph.indptr[cur] + np.minimum(off, np.maximum(d - 1, 0))]
            nxt = np.where(d > 0, nxt, cur).astype(np.int64)
            out[e * n:(e + 1) * n, t] = nxt
            cur = nxt
    return out
