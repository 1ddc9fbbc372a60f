"""KG-only baseline: max-pool over walk embeddings -> linear classifier.

Re-implements ``KGEClassificationModel`` and its datasets
(``/root/reference/src/stonkgs/models/kg_baseline_model.py:43-267``) in JAX:

  * features: node2vec — (N, 2*rw_len, dim) from source+target random-walk
    embeddings with zero vectors for OOV nodes (``:143-205``);
    TransE — (N, 3, dim) h/r/t (``:208-267``),
  * model: dimension-wise max pool -> dropout(0.1) -> linear -> softmax,
  * loss: weighted CE with inverse-class-frequency (INS) weights computed
    on the train split (``:419-430``).  Fidelity quirk: the reference feeds
    the SOFTMAX PROBABILITIES into CrossEntropyLoss (double softmax,
    ``:87-113``) — replicated.
  * optimizer: AdamW, lr 1e-3.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stonkgs_tpu.data.artifacts import KGArtifacts
from stonkgs_tpu.ops.losses import weighted_cross_entropy

Array = jax.Array


def build_node2vec_features(
    artifacts: KGArtifacts, sources, targets
) -> np.ndarray:
    """(N, 2*rw_len, dim): embeddings of source+target walks; OOV -> zeros."""
    n = len(sources)
    dim = artifacts.dim
    out = np.zeros((n, 2 * artifacts.rw_len, dim), np.float32)
    for i, (s, t) in enumerate(zip(sources, targets)):
        si = artifacts.name_to_idx.get(s, -1)
        ti = artifacts.name_to_idx.get(t, -1)
        if si >= 0:
            out[i, : artifacts.rw_len] = artifacts.vectors[
                artifacts.walk_indices[si]]
        if ti >= 0:
            out[i, artifacts.rw_len:] = artifacts.vectors[
                artifacts.walk_indices[ti]]
    return out


def build_transe_features(transe_artifacts, sources, relations, targets) -> np.ndarray:
    """(N, 3, dim) h/r/t embeddings; OOV -> zeros."""
    n = len(sources)
    out = np.zeros((n, 3, transe_artifacts.dim), np.float32)
    g = transe_artifacts.name_to_idx.get
    for i, (s, r, t) in enumerate(zip(sources, relations, targets)):
        for j, name in enumerate((s, r, t)):
            idx = g(name, -1)
            if idx >= 0:
                out[i, j] = transe_artifacts.vectors[idx]
    return out


def init_params(key: Array, d_in: int, num_classes: int) -> dict:
    """Initialize the max-pool + linear classifier parameters."""
    kk, _ = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    return {
        "kernel": jax.random.uniform(kk, (d_in, num_classes), jnp.float32,
                                     -bound, bound),
        "bias": jnp.zeros((num_classes,), jnp.float32),
    }


def forward(params: dict, x: Array, *, dropout_rng=None,
            deterministic=True) -> Array:
    """max-pool(dim 1) -> dropout -> linear -> softmax (returns PROBS)."""
    h = jnp.max(x, axis=1)
    if not deterministic and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 0.9, h.shape)
        h = jnp.where(keep, h / 0.9, 0.0)
    logits = h @ params["kernel"] + params["bias"]
    return jax.nn.softmax(logits, axis=-1)


def loss_fn(params, x, y, class_weights, rng):
    """Weighted CE over pooled walk embeddings (train-mode dropout)."""
    probs = forward(params, x, dropout_rng=rng, deterministic=False)
    # reference quirk: CE applied to probabilities as if they were logits
    return weighted_cross_entropy(probs, y, class_weights)


def ins_class_weights(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Inverse Number of Samples weights on the train split (``:419-430``)."""
    counts = np.bincount(labels, minlength=num_classes).astype(np.float64)
    return (1.0 / np.maximum(counts, 1.0)).astype(np.float32)


def train_kg_baseline(
    features: np.ndarray,       # (N, L, dim)
    labels: np.ndarray,         # (N,) int
    num_classes: int,
    *,
    epochs: int = 10,
    lr: float = 1e-3,
    batch_size: int = 16,
    seed: int = 0,
) -> dict:
    """Train the pooled-linear model with AdamW; returns params."""
    import optax

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    params = init_params(key, features.shape[-1], num_classes)
    weights = jnp.asarray(ins_class_weights(labels, num_classes))
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y, rng_key):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, weights, rng_key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(labels)
    # the reference DataLoader trains on partial batches (drop_last=False):
    # include the tail remainder every epoch (one extra compile per
    # distinct tail size — negligible for this small model)
    batch_size = min(batch_size, n)
    for epoch in range(epochs):
        perm = rng.permutation(n)
        for i in range(0, n, batch_size):
            idx = perm[i: i + batch_size]
            key, sub = jax.random.split(key)
            params, opt_state, _ = step(
                params, opt_state,
                jnp.asarray(features[idx]), jnp.asarray(labels[idx]), sub)
    return params


def predict(params: dict, features: np.ndarray, batch_size: int = 256) -> np.ndarray:
    """Batched argmax predictions for a feature array."""
    fn = jax.jit(lambda p, x: jnp.argmax(forward(p, x), axis=-1))
    out = []
    for i in range(0, len(features), batch_size):
        out.append(np.asarray(fn(params, jnp.asarray(features[i: i + batch_size]))))
    return np.concatenate(out) if out else np.zeros(0, np.int64)


def run_kg_baseline_cv(
    features: np.ndarray,
    labels_str,
    *,
    epochs: int = 10,
    lr: float = 1e-3,
    batch_size: int = 16,
    cv: int = 5,
    seed: int = 42,
    logger=None,
    task_name: str = "",
    output_dir: Optional[str] = None,
) -> Dict[str, float]:
    """Cross-validated weighted F1 (mirrors ``run_kg_baseline_classification_cv``).

    ``output_dir`` additionally writes the reference-style per-fold
    predicted-label TSV (``kg_baseline_model.py:492-517`` flow)."""
    import os

    from stonkgs_tpu.train.finetuning import (
        encode_labels, get_train_test_splits, weighted_f1,
    )

    labels, tag2id, id2tag = encode_labels(list(labels_str))
    splits = get_train_test_splits(labels, random_seed=seed, n_splits=cv)
    f1s, rows = [], []
    for fold, idx in enumerate(splits):
        params = train_kg_baseline(
            features[idx["train_idx"]], labels[idx["train_idx"]],
            num_classes=len(tag2id),
            epochs=epochs, lr=lr, batch_size=batch_size, seed=seed + fold,
        )
        pred = predict(params, features[idx["test_idx"]])
        f1 = weighted_f1(labels[idx["test_idx"]], pred)
        f1s.append(f1)
        rows.append((fold, idx["test_idx"], pred, labels[idx["test_idx"]]))
        if logger:
            logger.log_metric("f1_score_weighted", f1, step=fold)
    result = {"f1_score_mean": float(np.mean(f1s)),
              "f1_score_std": float(np.std(f1s))}
    if logger:
        logger.log_param("task name", task_name)
        logger.log_metrics(result)
    if output_dir:
        import pandas as pd

        os.makedirs(output_dir, exist_ok=True)
        pd.concat([
            pd.DataFrame({
                "split": fold, "index": te.tolist(),
                "predicted_label": [id2tag[p] for p in pred.tolist()],
                "true_label": [id2tag[t] for t in true.tolist()],
            }) for fold, te, pred, true in rows
        ], ignore_index=True).to_csv(
            os.path.join(output_dir,
                         f"predicted_labels_kg_{task_name}df.tsv"),
            sep="\t", index=False)
    return result
