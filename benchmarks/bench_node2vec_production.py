"""node2vec at PRODUCTION scale, executed for real (closes a r3 estimate).

Round-3 PERF.md carried extrapolations ("≈13 s walks, ≈33 min/epoch SGNS
at V=500k"); this bench runs the actual pipeline end to end at reference
scale — 500k nodes, walk length 127 x 4 epochs, dim 768, window 3,
negative 5, 1 iteration (the reference's production parameters,
``/root/reference/src/stonkgs/models/node2vec.py:300-331``) — and
publishes measured wall times per stage plus both TSV artifacts.

Synthetic graph: 500k nodes, ~2M undirected edges with a skewed degree
distribution (a few hubs + uniform tail), single connected component by
construction — the shape the INDRA KG extraction produces.

Stages timed separately: CSR build, C++ random walks, JAX SGNS training
(on the default backend — the TPU when available), artifact writes.
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time

import numpy as np

from _util import emit  # noqa: E402


def synthetic_edgelist(n_nodes: int, n_edges: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    # ring backbone guarantees one connected component
    ring_u = np.arange(n_nodes)
    ring_v = (ring_u + 1) % n_nodes
    m = n_edges - n_nodes
    # skewed endpoints: quadratic preference for low ids ≈ hub structure
    u = (rng.random(m) ** 2 * n_nodes).astype(np.int64)
    v = rng.integers(0, n_nodes, m)
    src = np.concatenate([ring_u, u])
    dst = np.concatenate([ring_v, v])
    names_src = np.char.add("p(HGNC:", src.astype("U12"))
    names_src = np.char.add(names_src, ")")
    names_dst = np.char.add("p(HGNC:", dst.astype("U12"))
    names_dst = np.char.add(names_dst, ")")
    return names_src.tolist(), names_dst.tolist()


def main(n_nodes: int, n_edges: int, outdir: str,
         walk_length: int = 127, epochs: int = 4, dim: int = 768,
         batch_pairs: int = 16384, device_pipeline: bool = False) -> None:
    from stonkgs_tpu.data.walker import CSRGraph, random_walks
    from stonkgs_tpu.models.node2vec import (
        save_embeddings_tsv, save_walks_tsv)
    from stonkgs_tpu.models.word2vec import train_word2vec

    print(f"# generating {n_edges:,} edges over {n_nodes:,} nodes",
          flush=True)
    src, dst = synthetic_edgelist(n_nodes, n_edges)

    t0 = time.perf_counter()
    graph = CSRGraph.from_edges(src, dst, directed=False)
    t_csr = time.perf_counter() - t0
    emit("node2vec CSR build (500k-node synthetic KG)",
         n_edges / t_csr, "edges/sec", wall_s=round(t_csr, 1),
         n_nodes=graph.n_nodes)

    t0 = time.perf_counter()
    walks = random_walks(graph, walk_len=walk_length, epochs=epochs, seed=0)
    t_walk = time.perf_counter() - t0
    steps = walks.shape[0] * walks.shape[1]
    emit("node2vec random walks (C++ walker, 2nd order p=q=1)",
         steps / t_walk / 1e6, "Msteps/sec", wall_s=round(t_walk, 1),
         corpus_tokens=int(steps))

    t0 = time.perf_counter()
    result = train_word2vec(
        walks, graph.n_nodes, dim=dim, window=3, negative=5, iterations=1,
        seed=0, index_to_name=graph.names,
        batch_pairs=None if device_pipeline else batch_pairs,
        device_pipeline=device_pipeline,
    )
    t_sgns = time.perf_counter() - t0
    pipe = "device-resident" if device_pipeline else "host pair feed"
    emit(f"node2vec SGNS training (JAX, dim {dim}, window 3, neg 5, "
         f"1 iter, {pipe})",
         t_sgns / 60, "minutes", wall_s=round(t_sgns, 1),
         corpus_tokens=int(steps))

    t0 = time.perf_counter()
    emb_path = os.path.join(outdir, "embeddings_best_model.tsv")
    walk_path = os.path.join(outdir, "random_walks_best_model.tsv")
    save_embeddings_tsv(result, emb_path)
    save_walks_tsv(result, walks, graph, walk_path)
    t_write = time.perf_counter() - t0

    total = t_csr + t_walk + t_sgns + t_write
    emit("node2vec production pipeline total (500k nodes, reference params)",
         total / 60, "minutes",
         stages_s={"csr": round(t_csr, 1), "walks": round(t_walk, 1),
                   "sgns": round(t_sgns, 1), "write": round(t_write, 1)},
         artifacts_gb=round(
             (os.path.getsize(emb_path) + os.path.getsize(walk_path)) / 1e9,
             2))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--walk-length", type=int, default=127)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch-pairs", type=int, default=16384)
    ap.add_argument("--device-pipeline", action="store_true",
                    help="fully on-device SGNS (round-5; removes the "
                         "input-bound Python pair feed)")
    ap.add_argument("--outdir", default=None)
    a = ap.parse_args()
    if a.outdir:
        os.makedirs(a.outdir, exist_ok=True)
        main(a.nodes, a.edges, a.outdir, a.walk_length, a.epochs, a.dim,
             a.batch_pairs, a.device_pipeline)
    else:
        with tempfile.TemporaryDirectory(prefix="stonkgs_n2v_") as d:
            main(a.nodes, a.edges, d, a.walk_length, a.epochs, a.dim,
                 a.batch_pairs, a.device_pipeline)
