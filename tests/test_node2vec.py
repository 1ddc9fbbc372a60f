"""node2vec pipeline tests: C++ walker, word2vec quality, artifact format."""

import os

import numpy as np
import pytest

from stonkgs_tpu.data.walker import CSRGraph, _load_lib, random_walks
from stonkgs_tpu.models.node2vec import (
    run_link_prediction, run_node2vec, split_edges_for_link_prediction,
)
from stonkgs_tpu.models.word2vec import train_word2vec


def _ring_edges(n=30):
    src = [f"n{i}" for i in range(n)]
    tgt = [f"n{(i + 1) % n}" for i in range(n)]
    return src, tgt


def test_csr_graph_build():
    g = CSRGraph.from_edges(["a", "b", "c"], ["b", "c", "a"])
    assert g.n_nodes == 3
    assert g.names == ["a", "b", "c"]
    # undirected: every node has degree 2
    np.testing.assert_array_equal(np.diff(g.indptr), [2, 2, 2])


def test_native_walker_builds_and_walks():
    assert _load_lib() is not None, "C++ walker failed to build"
    g = CSRGraph.from_edges(*_ring_edges())
    walks = random_walks(g, walk_len=10, epochs=2, seed=7)
    assert walks.shape == (60, 10)
    # epoch-major: row i starts at node i % n
    np.testing.assert_array_equal(walks[:30, 0], np.arange(30))
    np.testing.assert_array_equal(walks[30:, 0], np.arange(30))
    # every step is a graph neighbor (ring: +-1 mod n)
    diff = (walks[:, 1:] - walks[:, :-1]) % 30
    assert np.isin(diff, [1, 29]).all()


def test_walker_deterministic_across_threads():
    g = CSRGraph.from_edges(*_ring_edges())
    w1 = random_walks(g, walk_len=20, epochs=2, seed=3, n_threads=1)
    w4 = random_walks(g, walk_len=20, epochs=2, seed=3, n_threads=4)
    np.testing.assert_array_equal(w1, w4)


def test_second_order_walks_respect_pq():
    """q -> 0 (inv_q huge) favors exploration: returns are rare."""
    g = CSRGraph.from_edges(*_ring_edges(50))
    walks_q = random_walks(g, walk_len=40, epochs=4, seed=5, p=10.0, q=0.1)
    returns = (walks_q[:, 2:] == walks_q[:, :-2]).mean()
    walks_p = random_walks(g, walk_len=40, epochs=4, seed=5, p=0.1, q=10.0)
    returns_p = (walks_p[:, 2:] == walks_p[:, :-2]).mean()
    assert returns < 0.2 and returns_p > 0.8


def test_word2vec_learns_structure():
    """Nodes adjacent on a ring should embed closer than distant ones."""
    g = CSRGraph.from_edges(*_ring_edges(20))
    walks = random_walks(g, walk_len=30, epochs=30, seed=0)
    res = train_word2vec(walks, g.n_nodes, dim=16, window=3, negative=5,
                         iterations=2, seed=0, sample=0, alpha=0.05,
                         batch_pairs=128, index_to_name=g.names)
    row = {n: i for i, n in enumerate(res.index_to_word)}
    v = res.vectors / np.linalg.norm(res.vectors, axis=1, keepdims=True)

    def sim(a, b):
        return float(v[row[a]] @ v[row[b]])

    near = np.mean([sim(f"n{i}", f"n{(i + 1) % 20}") for i in range(20)])
    far = np.mean([sim(f"n{i}", f"n{(i + 10) % 20}") for i in range(20)])
    assert near > far + 0.15, (near, far)


def test_run_node2vec_artifacts(tmp_path):
    import pandas as pd

    src, tgt = _ring_edges(15)
    df = pd.DataFrame({"source": src, "target": tgt})
    result, walks, graph = run_node2vec(
        df, dimensions=8, walk_length=9, epochs=2, seed=1,
        output_dir=str(tmp_path),
    )
    emb_path = tmp_path / "embeddings_best_model.tsv"
    walk_path = tmp_path / "random_walks_best_model.tsv"
    assert emb_path.exists() and walk_path.exists()

    emb = pd.read_csv(emb_path, sep="\t", header=None, index_col=0)
    assert emb.shape == (15, 8)
    wdf = pd.read_csv(walk_path, sep="\t", header=None, index_col=0)
    assert wdf.shape == (15, 9)
    # artifacts load back through the standard artifact loader
    from stonkgs_tpu.data.artifacts import load_kg_artifacts
    art = load_kg_artifacts(emb_path, walk_path)
    assert art.rw_len == 9 and art.n_entities == 15
    # counts are sorted descending (gensim vocabulary order)
    assert (np.diff(result.counts) <= 0).all()


def test_link_prediction_beats_chance():
    # ring + chords: enough edges for a meaningful positive/negative split
    n = 60
    src = [f"n{i}" for i in range(n)] + [f"n{i}" for i in range(0, n, 3)]
    tgt = [f"n{(i + 1) % n}" for i in range(n)] + [
        f"n{(i + 7) % n}" for i in range(0, n, 3)]
    g = CSRGraph.from_edges(src, tgt)
    walks = random_walks(g, walk_len=30, epochs=20, seed=0)
    res = train_word2vec(walks, g.n_nodes, dim=16, window=3,
                         iterations=2, seed=0, sample=0, alpha=0.05,
                         batch_pairs=128, index_to_name=g.names)
    auc = run_link_prediction(g, res, seed=0, frac=0.5)
    assert auc > 0.6, auc


def test_edge_split_negatives_are_nonedges():
    g = CSRGraph.from_edges(*_ring_edges(25))
    pairs, labels = split_edges_for_link_prediction(g, frac=0.2, seed=0)
    edge_set = set()
    rows = np.repeat(np.arange(g.n_nodes), np.diff(g.indptr).astype(np.int64))
    for u, v in zip(rows, g.indices):
        edge_set.add((min(int(u), int(v)), max(int(u), int(v))))
    for (u, v), y in zip(pairs, labels):
        key = (min(int(u), int(v)), max(int(u), int(v)))
        assert (key in edge_set) == bool(y)
