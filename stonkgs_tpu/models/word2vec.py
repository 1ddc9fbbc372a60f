"""Word2vec (skip-gram / CBOW with negative sampling) as a JAX train loop.

Replaces gensim's C kernels in the node2vec pipeline (reference
``/root/reference/src/stonkgs/models/node2vec.py:314-334``:
dim 768, window 3, negative 5, iter 1, min_count 1, sample default).
Gensim semantics preserved at the algorithm level: count-sorted vocab,
unigram^0.75 negative-sampling table, dynamic (reduced) windows, linear
learning-rate decay; pair generation is vectorized numpy on host, the
embedding updates run as one jitted scatter-add SGD step on device.

Measured INPUT-BOUND at production scale (round 4, PERF.md: the Python
pair feed held the 500k-node/254M-token SGNS stage to 113.5 min while the
device step was ~22 ms) — a fully device-resident pair pipeline
(corpus in HBM, windows/negatives/SGD inside one ``lax.scan``) is the
known next optimization for this stage.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass
class Word2VecResult:
    """Trained skip-gram embeddings + vocabulary (count-sorted)."""
    vectors: np.ndarray          # (V, dim) input embeddings, count-sorted rows
    index_to_word: List         # row -> token (count-desc order, gensim-style)
    counts: np.ndarray           # (V,) corpus counts in row order


def _build_vocab(corpus: np.ndarray, n_tokens: int):
    """Counts + count-desc ordering (stable), gensim-style."""
    counts = np.bincount(corpus.reshape(-1), minlength=n_tokens)
    order = np.argsort(-counts, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return counts, order, rank


def _scatter_mean_add(table, idx, grads):
    """table[idx] += segment_mean(grads): batched SGD stays stable when the
    same row appears many times in one batch (sequential gensim updates are
    bounded per occurrence; a raw scatter-add would multiply the lr by the
    occurrence count and diverge on hot nodes).

    Normalizes each contribution by its index's batch count BEFORE the
    scatter — only a (V,) counts vector is materialized, never a full
    (V, D) temporary (that cost ~3 GB/step at 500k x 768)."""
    counts = jnp.zeros((table.shape[0],), jnp.float32).at[idx].add(1.0)
    per = grads / jnp.maximum(counts[idx], 1.0)[:, None]
    return table.at[idx].add(per)


@partial(jax.jit, donate_argnums=(0, 1))
def _sgd_step(syn0, syn1, centers, contexts, negatives, lr):
    """One batched skip-gram negative-sampling step.

    centers (B,), contexts (B,), negatives (B, K); updates both tables.
    Skip-gram: input = center, targets = context(+) and negatives(-).
    """
    B, K = negatives.shape
    v = syn0[centers]                                  # (B, D)
    targets = jnp.concatenate([contexts[:, None], negatives], axis=1)  # (B, 1+K)
    labels = jnp.concatenate(
        [jnp.ones((B, 1), jnp.float32), jnp.zeros((B, K), jnp.float32)], axis=1)
    u = syn1[targets]                                  # (B, 1+K, D)
    logits = jnp.einsum("bd,bkd->bk", v, u)
    g = (labels - jax.nn.sigmoid(logits)) * lr         # (B, 1+K)
    dv = jnp.einsum("bk,bkd->bd", g, u)                # grad wrt center vec
    du = g[:, :, None] * v[:, None, :]                 # grad wrt target vecs
    syn0 = _scatter_mean_add(syn0, centers, dv)
    syn1 = _scatter_mean_add(
        syn1, targets.reshape(-1), du.reshape(B * (1 + K), -1))
    return syn0, syn1


@partial(jax.jit, donate_argnums=(0, 1))
def _cbow_step(syn0, syn1, contexts, context_mask, targets_pos, negatives, lr):
    """CBOW step: input = mean of context vectors, target = center word."""
    B, K = negatives.shape
    cw = context_mask.astype(jnp.float32)              # (B, C)
    denom = jnp.maximum(cw.sum(axis=1, keepdims=True), 1.0)
    v = jnp.einsum("bc,bcd->bd", cw, syn0[contexts]) / denom
    targets = jnp.concatenate([targets_pos[:, None], negatives], axis=1)
    labels = jnp.concatenate(
        [jnp.ones((B, 1), jnp.float32), jnp.zeros((B, K), jnp.float32)], axis=1)
    u = syn1[targets]
    logits = jnp.einsum("bd,bkd->bk", v, u)
    g = (labels - jax.nn.sigmoid(logits)) * lr
    dv = jnp.einsum("bk,bkd->bd", g, u) / denom
    du = g[:, :, None] * v[:, None, :]
    syn0 = _scatter_mean_add(
        syn0, contexts.reshape(-1),
        (dv[:, None, :] * cw[:, :, None]).reshape(-1, dv.shape[-1]))
    syn1 = _scatter_mean_add(
        syn1, targets.reshape(-1), du.reshape(B * (1 + K), -1))
    return syn0, syn1


def _make_pairs(
    sentences: np.ndarray,   # (R, L) int32 of vocab-rank ids
    window: int,
    rng: np.random.Generator,
    keep_prob: Optional[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray]:
    """(center, context) pairs with gensim dynamic windows + subsampling."""
    R, L = sentences.shape
    if keep_prob is not None:
        keep = rng.random(sentences.shape) < keep_prob[sentences]
    else:
        keep = np.ones(sentences.shape, bool)
    centers, contexts = [], []
    reduced = rng.integers(0, window, (R, L))
    eff = window - reduced                      # effective window per pos
    for off in range(1, window + 1):
        valid = (eff[:, :-off] >= off) & keep[:, :-off] & keep[:, off:]
        r, c = np.nonzero(valid)
        a = sentences[r, c]
        b = sentences[r, c + off]
        # symmetric pairs (center->context both directions, like gensim sg)
        centers.append(a)
        contexts.append(b)
        centers.append(b)
        contexts.append(a)
    return np.concatenate(centers), np.concatenate(contexts)


def train_word2vec(
    corpus: np.ndarray,            # (R, L) int32 token ids in [0, n_tokens)
    n_tokens: int,
    *,
    dim: int = 768,
    window: int = 3,
    negative: int = 5,
    iterations: int = 1,
    alpha: float = 0.025,
    min_alpha: float = 1e-4,
    sample: float = 1e-3,
    sg: bool = True,
    seed: int = 1,
    batch_pairs: Optional[int] = None,
    index_to_name: Optional[list] = None,
) -> Word2VecResult:
    """Train embeddings over a walk corpus; rows count-sorted like gensim."""
    rng = np.random.default_rng(seed)
    counts, order, rank = _build_vocab(corpus, n_tokens)
    corpus_ranked = rank[corpus].astype(np.int32)      # ids = count ranks
    counts_sorted = counts[order]
    V = n_tokens

    # subsampling keep prob (gensim formula)
    if sample and sample > 0:
        total = counts_sorted.sum()
        thresh = sample * total
        with np.errstate(divide="ignore", invalid="ignore"):
            kp = (np.sqrt(counts_sorted / thresh) + 1) * (thresh / np.maximum(counts_sorted, 1))
        keep_prob = np.clip(kp, 0, 1).astype(np.float32)
    else:
        keep_prob = None

    # negative sampling distribution ~ count^0.75
    neg_probs = counts_sorted.astype(np.float64) ** 0.75
    neg_probs /= neg_probs.sum()
    neg_cum = np.cumsum(neg_probs)

    k0 = jax.random.PRNGKey(seed)
    syn0 = (jax.random.uniform(k0, (V, dim), jnp.float32) - 0.5) / dim
    syn1 = jnp.zeros((V, dim), jnp.float32)

    # total update count for the linear LR schedule
    pair_batches = []
    for _ in range(iterations):
        c, x = _make_pairs(corpus_ranked, window, rng, keep_prob)
        perm = rng.permutation(len(c))
        pair_batches.append((c[perm], x[perm]))
    total_pairs = sum(len(c) for c, _ in pair_batches)
    if batch_pairs is None:
        # segment-mean updates learn per BATCH, not per occurrence: size
        # batches so the run makes >= ~2000 update steps regardless of
        # corpus size (capped at 64k pairs/step for device efficiency)
        batch_pairs = int(min(1 << 16, max(128, total_pairs // 2000)))

    done = 0
    for c_all, x_all in pair_batches:
        for i in range(0, len(c_all), batch_pairs):
            c = c_all[i: i + batch_pairs]
            x = x_all[i: i + batch_pairs]
            neg = np.searchsorted(
                neg_cum, rng.random((len(c), negative))).astype(np.int32)
            frac = done / max(total_pairs, 1)
            lr = np.float32(alpha - (alpha - min_alpha) * frac)
            if sg:
                syn0, syn1 = _sgd_step(
                    syn0, syn1, jnp.asarray(c), jnp.asarray(x),
                    jnp.asarray(neg), lr)
            else:
                # CBOW on consecutive pairs degenerates to sg with C=1 here;
                # full-window CBOW path:
                syn0, syn1 = _cbow_step(
                    syn0, syn1, jnp.asarray(x)[:, None],
                    jnp.ones((len(c), 1), jnp.float32),
                    jnp.asarray(c), jnp.asarray(neg), lr)
            done += len(c)

    vectors = np.asarray(syn0)
    names = (
        [index_to_name[i] for i in order] if index_to_name is not None
        else [int(i) for i in order]
    )
    return Word2VecResult(vectors=vectors, index_to_word=names,
                          counts=counts_sorted)
