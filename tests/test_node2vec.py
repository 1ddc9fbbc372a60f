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


# ---------------------------------------------------------------------------
# Device-resident SGNS pipeline (round-5: removes the input-bound feeder)
# ---------------------------------------------------------------------------

def test_masked_step_equals_compacted_step():
    """A masked batch must update EXACTLY like its compacted survivors:
    the device pipeline's static (pos, offset, direction) pair layout
    carries mask=0 slots instead of dynamic compaction, so masked-out
    slots may contribute nothing — to the gradient or the mean counts."""
    import jax
    import jax.numpy as jnp

    from stonkgs_tpu.models.word2vec import _sgd_core

    rng = np.random.default_rng(0)
    V, D, B, K = 13, 8, 24, 3
    syn0 = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    syn1 = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    c = rng.integers(0, V, B).astype(np.int32)
    x = rng.integers(0, V, B).astype(np.int32)
    neg = rng.integers(0, V, (B, K)).astype(np.int32)
    mask = (rng.random(B) < 0.6).astype(np.float32)
    lr = np.float32(0.05)

    m0, m1 = _sgd_core(syn0, syn1, jnp.asarray(c), jnp.asarray(x),
                       jnp.asarray(neg), lr, jnp.asarray(mask))
    keep = mask.astype(bool)
    c0, c1 = _sgd_core(syn0, syn1, jnp.asarray(c[keep]),
                       jnp.asarray(x[keep]), jnp.asarray(neg[keep]), lr)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(c0),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(c1),
                               atol=1e-6, rtol=1e-6)
    # all-masked batch is a no-op
    z0, z1 = _sgd_core(syn0, syn1, jnp.asarray(c), jnp.asarray(x),
                       jnp.asarray(neg), lr, jnp.zeros(B, jnp.float32))
    np.testing.assert_allclose(np.asarray(z0), np.asarray(syn0), atol=0)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(syn1), atol=0)


def test_device_pair_slab_matches_window_rule():
    """Device pair slots replicate _make_pairs' gating: the LEFT token's
    effective window admits both directions; padded rows emit nothing."""
    import jax
    import jax.numpy as jnp

    from stonkgs_tpu.models.word2vec import (
        _device_pair_slab, _pair_slots_per_row)

    Rb, L, window = 3, 6, 2
    V = Rb * L  # unique token per slot: pad-row tokens are identifiable
    toks = jnp.asarray(np.arange(Rb * L).reshape(Rb, L), jnp.int32)
    row_valid = jnp.asarray([True, True, False])
    keep_all = jnp.ones(V, jnp.float32)
    c, x, m = _device_pair_slab(
        toks, row_valid, jax.random.PRNGKey(0), keep_all, window)
    assert c.shape == x.shape == m.shape
    assert c.shape[0] == Rb * _pair_slots_per_row(L, window)
    m = np.asarray(m).astype(bool)
    c, x = np.asarray(c), np.asarray(x)
    # pairs touching the padded row never survive
    pad_tokens = set(np.asarray(toks)[2].tolist())
    assert not any((ci in pad_tokens or xi in pad_tokens)
                   for ci, xi in zip(c[m], x[m]))
    # admitted pairs relate tokens at distance <= window in the same row
    assert all(1 <= abs(int(ci) - int(xi)) <= window
               and int(ci) // L == int(xi) // L
               for ci, xi in zip(c[m], x[m]))
    # direction symmetry: every admitted (a -> b) slot has its mirror
    fwd = {(int(a), int(b)) for a, b in zip(c[m], x[m])}
    assert fwd == {(b, a) for a, b in fwd}
    assert fwd  # something actually survived


def test_alias_tables_reconstruct_distribution():
    """Vose alias tables must carry EXACTLY the input distribution:
    probs[i] * V == thresh[i] + sum(1 - thresh[j] for alias[j] == i)."""
    from stonkgs_tpu.models.word2vec import _build_alias

    rng = np.random.default_rng(3)
    probs = rng.random(257) ** 2 + 1e-9   # skewed, like unigram^0.75
    probs /= probs.sum()
    alias, thresh = _build_alias(probs)
    V = len(probs)
    recon = thresh.astype(np.float64).copy()
    np.add.at(recon, alias, 1.0 - thresh.astype(np.float64))
    np.testing.assert_allclose(recon / V, probs, atol=1e-6)
    # degenerate single-token vocab: everything maps to itself
    a1, t1 = _build_alias(np.asarray([1.0]))
    assert a1[0] == 0 and t1[0] == 1.0


def test_word2vec_device_pipeline_learns_structure():
    """Ring-adjacency structure must emerge from the device pipeline too
    (same assertion as the host-pipeline quality test)."""
    g = CSRGraph.from_edges(*_ring_edges(20))
    walks = random_walks(g, walk_len=30, epochs=30, seed=0)
    # batch_pairs budgets POTENTIAL slots; keep slabs to ONE row here — on
    # a 20-token vocab the segment-mean update collapses a multi-row slab
    # to ~one averaged step per node, so a tiny corpus needs many small
    # slabs (production V=500k never hits this collision density: a
    # 173-row slab holds ~22k tokens over 500k ranks)
    res = train_word2vec(walks, g.n_nodes, dim=16, window=3, negative=5,
                         iterations=2, seed=0, sample=0, alpha=0.05,
                         batch_pairs=128, index_to_name=g.names,
                         device_pipeline=True)
    row = {n: i for i, n in enumerate(res.index_to_word)}
    v = res.vectors / np.linalg.norm(res.vectors, axis=1, keepdims=True)

    def sim(a, b):
        return float(v[row[a]] @ v[row[b]])

    near = np.mean([sim(f"n{i}", f"n{(i + 1) % 20}") for i in range(20)])
    far = np.mean([sim(f"n{i}", f"n{(i + 10) % 20}") for i in range(20)])
    assert near > far + 0.15, (near, far)
