"""KG artifacts: node2vec embeddings + random walks, as dense arrays.

The reference loads two TSVs (``embeddings_best_model.tsv``,
``random_walks_best_model.tsv``, produced by
``/root/reference/src/stonkgs/models/node2vec.py:341-370``) into Python
dicts via ``prepare_df`` (``models/kg_baseline_model.py:270-280``) and does
per-row dict lookups.  Here they become:

  * ``name_to_idx``  — entity name -> data index (enumerate order, exactly
    the reference's ``kg_name_to_idx``),
  * ``vectors``      — (N, H) float32 embedding matrix in key order,
  * ``walk_indices`` — (N, rw_len) int32 matrix of each node's random walk
    mapped to data indices,

so sequence assembly is a vectorized gather instead of a Python loop.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Union

import numpy as np

PathLike = Union[str, Path]


def prepare_df(embedding_path: PathLike, sep: str = "\t") -> Dict[str, np.ndarray]:
    """TSV (no header, index col 0) -> {name: row values}.

    Behavior-compatible with the reference ``prepare_df``
    (``kg_baseline_model.py:270-280``); kept for API compatibility — the
    array-based loaders below are preferred."""
    import pandas as pd

    df = pd.read_csv(embedding_path, sep=sep, header=None, index_col=0)
    return {index: row.values for index, row in df.iterrows()}


@dataclasses.dataclass
class KGArtifacts:
    """Dense random-walk + embedding tables for the KG backbone."""

    names: List[str]
    name_to_idx: Dict[str, int]
    vectors: np.ndarray        # (N, H) float32
    walk_indices: np.ndarray   # (N, rw_len) int32, values are data indices
    rw_len: int

    @property
    def n_entities(self) -> int:
        return len(self.names)

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]

    def walks_for(self, names: np.ndarray, unk_id: int = 100) -> np.ndarray:
        """(B,) array of entity names -> (B, rw_len) walk index rows.

        Unknown nodes get an all-``unk_id`` walk (reference UNK fallback,
        ``stonkgs_for_embeddings.py:117-128``)."""
        idx = np.fromiter(
            (self.name_to_idx.get(n, -1) for n in names), np.int64, len(names)
        )
        out = np.where(
            idx[:, None] >= 0,
            self.walk_indices[np.maximum(idx, 0)],
            np.int32(unk_id),
        )
        return out.astype(np.int32)


def load_kg_artifacts(
    embedding_path: PathLike,
    random_walk_path: PathLike,
    sep: str = "\t",
) -> KGArtifacts:
    """Load embeddings + walks TSVs into dense arrays.

    Asserts both cover the same entities, like the reference
    (``indra_for_pretraining.py:145-147``)."""
    import pandas as pd

    emb = pd.read_csv(embedding_path, sep=sep, header=None, index_col=0)
    walks = pd.read_csv(random_walk_path, sep=sep, header=None, index_col=0)
    assert len(emb) == len(walks), "Embeddings and random walks must cover the same entities"

    names = [str(n) for n in emb.index]
    name_to_idx = {n: i for i, n in enumerate(names)}
    vectors = emb.to_numpy(np.float32)

    walk_names = walks.to_numpy()
    rw_len = walk_names.shape[1]
    flat = np.fromiter(
        (name_to_idx[str(n)] for n in walk_names.reshape(-1)),
        np.int32,
        walk_names.size,
    )
    # reorder walk rows into key order of the embeddings file
    walk_rows = {str(n): i for i, n in enumerate(walks.index)}
    order = np.fromiter((walk_rows[n] for n in names), np.int64, len(names))
    walk_indices = flat.reshape(len(walks), rw_len)[order]
    return KGArtifacts(names, name_to_idx, vectors, walk_indices, rw_len)


def save_kg_artifacts(
    artifacts: KGArtifacts, embedding_path: PathLike, random_walk_path: PathLike
) -> None:
    """Write artifacts back in the reference TSV format (tests, node2vec)."""
    with open(embedding_path, "w") as f:
        for name, vec in zip(artifacts.names, artifacts.vectors):
            f.write(name + "\t" + "\t".join(repr(float(v)) for v in vec) + "\n")
    with open(random_walk_path, "w") as f:
        for name, walk in zip(artifacts.names, artifacts.walk_indices):
            f.write(
                name + "\t"
                + "\t".join(artifacts.names[int(w)] for w in walk) + "\n"
            )


def make_random_artifacts(
    n_entities: int, dim: int = 768, rw_len: int = 127, seed: int = 0,
    name_fmt: str = "node{}",
) -> KGArtifacts:
    """Synthetic artifacts for tests and benchmarks."""
    rng = np.random.default_rng(seed)
    names = [name_fmt.format(i) for i in range(n_entities)]
    return KGArtifacts(
        names=names,
        name_to_idx={n: i for i, n in enumerate(names)},
        vectors=rng.normal(size=(n_entities, dim)).astype(np.float32),
        walk_indices=rng.integers(0, n_entities, (n_entities, rw_len), dtype=np.int32),
        rw_len=rw_len,
    )
