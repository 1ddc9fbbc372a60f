"""Memory-mapped feature store for corpus-scale pre-training.

The INDRA corpus is ~35M text-triple pairs; materialized 512-token feature
arrays run to hundreds of GB — far beyond host RAM.  This store writes each
feature as an ``.npy`` memmap once (append-friendly, int32), and serves
shuffled batches through the OS page cache.

Replaces the reference's pandas-pickle dataset loading
(``stonkgs_pretraining.py:37-52``) for large runs; the in-memory path
(``cli.pretrain.load_preprocessed_dataset``) remains for small corpora.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator

import numpy as np

META_NAME = "meta.json"


class MemmapFeatureStore:
    """Directory of per-feature ``.npy`` memmaps with one shared length."""

    def __init__(self, directory: str, mode: str = "r"):
        self.directory = directory
        self.mode = mode
        self._arrays: Dict[str, np.memmap] = {}
        meta_path = os.path.join(directory, META_NAME)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = json.load(f)
            for key, spec in self.meta["features"].items():
                self._arrays[key] = np.lib.format.open_memmap(
                    os.path.join(directory, f"{key}.npy"), mode=mode)
        else:
            self.meta = {"n_rows": 0, "features": {}}

    def __len__(self) -> int:
        return self.meta["n_rows"]

    def keys(self):
        return self._arrays.keys()

    def __getitem__(self, key):
        return self._arrays[key]

    @classmethod
    def write(cls, directory: str, features: Dict[str, np.ndarray],
              dtype=np.int32) -> "MemmapFeatureStore":
        """Create a store from in-memory arrays (one-time conversion)."""
        os.makedirs(directory, exist_ok=True)
        n = len(next(iter(features.values())))
        meta = {"n_rows": int(n), "features": {}}
        for key, arr in features.items():
            arr = np.asarray(arr)
            out = np.lib.format.open_memmap(
                os.path.join(directory, f"{key}.npy"), mode="w+",
                dtype=dtype, shape=arr.shape)
            out[:] = arr
            out.flush()
            meta["features"][key] = {"shape": list(arr.shape),
                                     "dtype": np.dtype(dtype).name}
        with open(os.path.join(directory, META_NAME), "w") as f:
            json.dump(meta, f)
        return cls(directory)

    @classmethod
    def convert_chunked(cls, directory: str, chunks, dtype=np.int32
                        ) -> "MemmapFeatureStore":
        """Build a store from an iterator of feature-dict chunks without
        holding the corpus in memory (two passes not required: the store
        grows by rewriting the memmap header after each append)."""
        os.makedirs(directory, exist_ok=True)
        writers: Dict[str, object] = {}
        n = 0
        shapes = {}
        tmp_paths = {}
        for chunk in chunks:
            m = len(next(iter(chunk.values())))
            for key, arr in chunk.items():
                arr = np.asarray(arr, dtype)
                if key not in writers:
                    tmp_paths[key] = os.path.join(directory, f"{key}.bin")
                    writers[key] = open(tmp_paths[key], "wb")
                    shapes[key] = arr.shape[1:]
                writers[key].write(np.ascontiguousarray(arr).tobytes())
            n += m
        meta = {"n_rows": int(n), "features": {}}
        for key, fh in writers.items():
            fh.close()
            shape = (n,) + tuple(shapes[key])
            # wrap raw binary as a .npy memmap
            out = np.lib.format.open_memmap(
                os.path.join(directory, f"{key}.npy"), mode="w+",
                dtype=dtype, shape=shape)
            raw = np.memmap(tmp_paths[key], dtype=dtype, mode="r", shape=shape)
            step = max(1, (1 << 27) // max(int(np.prod(shape[1:])) * 4, 1))
            for i in range(0, n, step):
                out[i: i + step] = raw[i: i + step]
            out.flush()
            del raw
            os.remove(tmp_paths[key])
            meta["features"][key] = {"shape": list(shape),
                                     "dtype": np.dtype(dtype).name}
        with open(os.path.join(directory, META_NAME), "w") as f:
            json.dump(meta, f)
        return cls(directory)


def memmap_data_iterator(
    store: MemmapFeatureStore,
    batch_size: int,
    *,
    seed: int = 0,
    shuffle_buffer: int = 1 << 16,
) -> Iterator[Dict[str, np.ndarray]]:
    """Shuffling epoch iterator over a memmap store.

    Full random permutation of indices per epoch (the index array is tiny
    even at 35M rows); gathers touch the memmaps through the page cache."""
    n = len(store)
    if n < batch_size:
        raise ValueError(
            f"store has {n} rows < batch_size {batch_size}: the epoch "
            f"loop would never yield")
    rng = np.random.default_rng(seed)
    keys = list(store.keys())
    while True:
        perm = rng.permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = np.sort(perm[i: i + batch_size])  # sorted -> sequential IO
            yield {k: np.asarray(store[k][idx]) for k in keys}
