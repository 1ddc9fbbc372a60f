"""node2vec KG-embedding pipeline: C++ walker + JAX word2vec + HPO.

Re-implements ``run_node2vec`` / ``run_node2vec_hpo``
(``/root/reference/src/stonkgs/models/node2vec.py:270-370,93-257``):
CSR random walks (walklen 127, epochs 4, p=q=1) -> word2vec (dim 768,
window 3, negative 5, 1 iter, min_count 1) -> two TSV artifacts.

Artifact format preserved EXACTLY, including the reference quirk in the
walks file: it zips the count-sorted vocab (``wv.index2entity``) with the
raw walk matrix (csr-node-id order), so row k pairs the k-th most frequent
node with the walk that STARTED at csr node id k (``node2vec.py:358-370``).
The preprocessors consume this file as "the walk of that node", so fidelity
requires reproducing the pairing, not fixing it.

HPO uses the link-prediction ROC-AUC objective (EdgeSplitter-style negative
sampling + Hadamard features + LogisticRegression) over (epochs, window);
optuna if importable, deterministic grid search otherwise.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Tuple

import numpy as np

from stonkgs_tpu.data.walker import CSRGraph, random_walks
from stonkgs_tpu.models.word2vec import Word2VecResult, train_word2vec

logger = logging.getLogger(__name__)


def save_embeddings_tsv(result: Word2VecResult, path) -> None:
    """Count-sorted ``name\\tv0\\tv1...`` rows (reference ``:350-354``)."""
    with open(path, "w") as f:
        for name, vec in zip(result.index_to_word, result.vectors):
            f.write(str(name) + "\t" + "\t".join(repr(float(v)) for v in vec) + "\n")


def save_walks_tsv(
    result: Word2VecResult, walks: np.ndarray, graph: CSRGraph, path
) -> None:
    """Reference walks format incl. the vocab/walk-row pairing quirk."""
    with open(path, "w") as f:
        for name, walk in zip(result.index_to_word, walks):
            f.write(str(name) + "\t"
                    + "\t".join(graph.names[int(w)] for w in walk) + "\n")


def run_node2vec(
    triples_df=None,
    pretraining_path: Optional[str] = None,
    sep: str = "\t",
    *,
    dimensions: int = 768,
    walk_length: int = 127,
    epochs: int = 4,
    window_size: int = 3,
    negative: int = 5,
    iterations: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    n_threads: Optional[int] = None,
    seed: int = 0,
    embeddings_output_path: Optional[str] = None,
    random_walks_output_path: Optional[str] = None,
    output_dir: str = ".",
    device_pipeline: bool = False,
) -> Tuple[Word2VecResult, np.ndarray, CSRGraph]:
    """Production node2vec run (reference defaults).

    ``device_pipeline=True`` keeps the SGNS stage fully on-device
    (round-5: removes the measured input-bound Python pair feed; see
    ``stonkgs_tpu.models.word2vec`` and PERF.md)."""
    import pandas as pd

    if triples_df is None:
        triples_df = pd.read_csv(pretraining_path, sep=sep)
    n_expected = len(set(triples_df["source"]) | set(triples_df["target"]))
    logger.info("%d node embeddings are expected", n_expected)

    graph = CSRGraph.from_edges(
        triples_df["source"].tolist(), triples_df["target"].tolist(),
        directed=False,
    )
    walks = random_walks(
        graph, walk_len=walk_length, epochs=epochs,
        seed=seed, p=p, q=q, n_threads=n_threads,
    )
    result = train_word2vec(
        walks, graph.n_nodes,
        dim=dimensions, window=window_size, negative=negative,
        iterations=iterations, seed=seed,
        index_to_name=graph.names,
        device_pipeline=device_pipeline,
    )
    logger.info("%d embeddings were learned", len(result.index_to_word))

    if embeddings_output_path is None:
        embeddings_output_path = os.path.join(output_dir, "embeddings_best_model.tsv")
    if random_walks_output_path is None:
        random_walks_output_path = os.path.join(output_dir, "random_walks_best_model.tsv")
    save_embeddings_tsv(result, embeddings_output_path)
    save_walks_tsv(result, walks, graph, random_walks_output_path)
    return result, walks, graph


# ---------------------------------------------------------------------------
# link prediction + HPO
# ---------------------------------------------------------------------------

def split_edges_for_link_prediction(
    graph: CSRGraph, frac: float = 0.1, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """EdgeSplitter-style (positive, negative) edge sample.

    Samples ``frac`` of the edges as positives and an equal number of
    uniformly random non-edges as negatives.  Returns (pairs (M, 2) node
    ids, labels (M,))."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(graph.n_nodes),
                     np.diff(graph.indptr).astype(np.int64))
    edges = np.stack([rows, graph.indices], axis=1)
    edges = edges[edges[:, 0] < edges[:, 1]]  # undirected dedup
    k = max(int(len(edges) * frac), 1)
    pos = edges[rng.choice(len(edges), k, replace=False)]

    edge_set = set(map(tuple, edges.tolist()))
    neg = []
    # bounded sampling: a small/dense graph may have fewer than k distinct
    # non-edges — take what exists instead of spinning forever
    attempts = 0
    max_attempts = 100 * k + 1000
    while len(neg) < k and attempts < max_attempts:
        a = rng.integers(0, graph.n_nodes, k)
        b = rng.integers(0, graph.n_nodes, k)
        attempts += k
        for u, v in zip(a, b):
            if u == v:
                continue
            key = (min(int(u), int(v)), max(int(u), int(v)))
            if key not in edge_set:
                neg.append(key)
            if len(neg) == k:
                break
    if len(neg) < k:
        if not neg:
            raise ValueError(
                "graph has no non-edges to sample — link prediction is "
                "undefined on a complete graph")
        logger.warning(
            "only %d of %d negative samples found (dense graph); "
            "truncating positives to match", len(neg), k)
        k = len(neg)
        pos = pos[:k]
    pairs = np.concatenate([pos, np.asarray(neg)], axis=0)
    labels = np.concatenate([np.ones(k), np.zeros(k)])
    return pairs, labels


def run_link_prediction(
    graph: CSRGraph, result: Word2VecResult, seed: int = 0, frac: float = 0.1
) -> float:
    """Hadamard features + LogisticRegression ROC-AUC (reference ``:34-71``)."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import roc_auc_score
    from sklearn.model_selection import train_test_split

    name_to_row = {n: i for i, n in enumerate(result.index_to_word)}
    vec = result.vectors
    pairs, labels = split_edges_for_link_prediction(graph, frac=frac, seed=seed)
    feats = np.asarray([
        vec[name_to_row[graph.names[u]]] * vec[name_to_row[graph.names[v]]]
        for u, v in pairs
    ])
    x_tr, x_te, y_tr, y_te = train_test_split(
        feats, labels, stratify=labels, random_state=seed)
    clf = LogisticRegression(max_iter=1000).fit(x_tr, y_tr)
    return float(roc_auc_score(y_te, clf.predict(x_te)))


def run_node2vec_hpo(
    triples_df=None,
    pretraining_path: Optional[str] = None,
    sep: str = "\t",
    *,
    n_trials: int = 1,
    seed: int = 0,
    dimensions: int = 768,
    walk_length: int = 127,
    output_dir: str = ".",
    embeddings_output_path: Optional[str] = None,
    random_walks_output_path: Optional[str] = None,
    logger_fn=None,
) -> Dict:
    """HPO over (epochs in {2,4,8}, window in [3,5]) maximizing link-pred AUC.

    Uses optuna when available; otherwise a deterministic sweep over the
    same space."""
    import pandas as pd

    if triples_df is None:
        triples_df = pd.read_csv(pretraining_path, sep=sep)
    graph = CSRGraph.from_edges(
        triples_df["source"].tolist(), triples_df["target"].tolist())

    trials = []

    def evaluate(epochs: int, window: int) -> float:
        walks = random_walks(graph, walk_len=walk_length, epochs=epochs, seed=seed)
        result = train_word2vec(
            walks, graph.n_nodes, dim=dimensions, window=window,
            negative=5, iterations=1, seed=seed, index_to_name=graph.names,
        )
        auc = run_link_prediction(graph, result, seed=seed)
        trials.append({"epochs": epochs, "window": window, "auc": auc,
                       "result": result, "walks": walks})
        if logger_fn:
            logger_fn({"epochs": epochs, "window": window, "auc": auc})
        return auc

    try:
        import optuna

        def objective(trial):
            return evaluate(
                trial.suggest_categorical("epochs", [2, 4, 8]),
                trial.suggest_int("window_size", 3, 5),
            )

        study = optuna.create_study(direction="maximize")
        study.optimize(objective, n_trials=n_trials)
    except ImportError:
        space = [(e, w) for e in (2, 4, 8) for w in (3, 4, 5)]
        for epochs, window in space[:n_trials]:
            evaluate(epochs, window)

    best = max(trials, key=lambda t: t["auc"])
    if embeddings_output_path is None:
        embeddings_output_path = os.path.join(output_dir, "embeddings_best_model.tsv")
    if random_walks_output_path is None:
        random_walks_output_path = os.path.join(output_dir, "random_walks_best_model.tsv")
    save_embeddings_tsv(best["result"], embeddings_output_path)
    save_walks_tsv(best["result"], best["walks"], graph, random_walks_output_path)
    return {"best_auc": best["auc"], "best_params":
            {"epochs": best["epochs"], "window": best["window"]},
            "n_trials": len(trials)}
