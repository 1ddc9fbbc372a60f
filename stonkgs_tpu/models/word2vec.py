"""Word2vec (skip-gram / CBOW with negative sampling) as a JAX train loop.

Replaces gensim's C kernels in the node2vec pipeline (reference
``/root/reference/src/stonkgs/models/node2vec.py:314-334``:
dim 768, window 3, negative 5, iter 1, min_count 1, sample default).
Gensim semantics preserved at the algorithm level: count-sorted vocab,
unigram^0.75 negative-sampling table, dynamic (reduced) windows, linear
learning-rate decay; pair generation is vectorized numpy on host, the
embedding updates run as one jitted scatter-add SGD step on device.

Two pipelines share the same vocab/subsample/negative-table math:

* host pipeline (default): pair generation is vectorized numpy on host,
  the embedding updates run as one jitted scatter-add SGD step on
  device.  Measured INPUT-BOUND at production scale (round 4, PERF.md:
  the Python pair feed held the 500k-node/254M-token SGNS stage to
  113.5 min while the device step was ~22 ms).
* device pipeline (``device_pipeline=True``): the ranked walk corpus
  lives in HBM and dynamic windows, subsampling, negative sampling and
  the masked SGD update all happen inside one ``lax.scan`` — the host
  only permutes row order once per epoch.  Pairs are laid out as a
  STATIC (center, context, mask) tensor over all (position, offset,
  direction) slots of a row slab; invalid slots carry mask=0 and
  contribute exactly nothing (masked scatter-mean; see
  ``tests/test_node2vec.py::test_masked_step_equals_compacted_step``).
  This removes the one input-bound stage left in the repo (round-5).
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


def _masked_scatter_mean_add(table, idx, grads, weights):
    """:func:`_scatter_mean_add` where each contribution carries a 0/1
    weight: masked-out entries contribute nothing to the update AND
    nothing to the per-row occurrence count, so a masked batch updates
    exactly like the compacted batch of its surviving pairs."""
    counts = jnp.zeros((table.shape[0],), jnp.float32).at[idx].add(weights)
    per = grads * (weights / jnp.maximum(counts[idx], 1.0))[:, None]
    return table.at[idx].add(per)


def _sgd_core(syn0, syn1, centers, contexts, negatives, lr, mask=None):
    """One batched skip-gram negative-sampling update (shared math).

    centers (B,), contexts (B,), negatives (B, K); updates both tables.
    Skip-gram: input = center, targets = context(+) and negatives(-).
    ``mask`` (B,) float 0/1 drops invalid pair slots exactly (device
    pipeline: the static (position, offset, direction) pair layout
    carries mask=0 slots instead of compacting to a dynamic shape).
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
    if mask is None:
        syn0 = _scatter_mean_add(syn0, centers, dv)
        syn1 = _scatter_mean_add(
            syn1, targets.reshape(-1), du.reshape(B * (1 + K), -1))
    else:
        syn0 = _masked_scatter_mean_add(syn0, centers, dv, mask)
        wide = jnp.broadcast_to(mask[:, None], (B, 1 + K)).reshape(-1)
        syn1 = _masked_scatter_mean_add(
            syn1, targets.reshape(-1), du.reshape(B * (1 + K), -1), wide)
    return syn0, syn1


@partial(jax.jit, donate_argnums=(0, 1))
def _sgd_step(syn0, syn1, centers, contexts, negatives, lr):
    """Host-pipeline step: compacted real pairs, no mask."""
    return _sgd_core(syn0, syn1, centers, contexts, negatives, lr)


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


def _pair_slots_per_row(L: int, window: int) -> int:
    """Static potential-pair slots per corpus row in the device layout."""
    return 2 * window * L


def _device_pair_slab(toks, row_valid, key, keep_prob, window: int):
    """Static (centers, contexts, mask) pair layout for one row slab.

    Every (position, offset, direction) slot of the slab becomes one pair
    slot; ``mask`` keeps exactly the pairs the host pipeline's
    :func:`_make_pairs` would emit (same dynamic-window rule: the LEFT
    token's effective window gates both directions) plus drops padded
    rows.  Shapes are static so the whole generation lives inside jit.

    Layout note: every piece keeps the full (Rb, L) tile shape — right
    neighbors come from ``jnp.roll`` (wrapped slots are masked off) and
    pieces concatenate along axis 0 only, so all intermediates stay
    tile-aligned.  Measured in-scan on v5e this is a WASH vs slicing
    ``toks[:, :-off]`` per offset (104.2 vs 101.3 ms/step in the same
    process — XLA handles the ragged reshapes fine inside the scan); it
    is kept for the uniform static slot count ``2 * window * L``.  The
    step-time win in this chunk came from alias-method negative sampling
    instead (1.8x: 186 -> 104 ms/step, same-process A/B — see
    :func:`_build_alias`).
    """
    Rb, L = toks.shape
    k_keep, k_red = jax.random.split(key)
    keep = jax.random.uniform(k_keep, (Rb, L)) < keep_prob[toks]
    red = jax.random.randint(k_red, (Rb, L), 0, window)
    eff = window - red
    col = jax.lax.broadcasted_iota(jnp.int32, (Rb, L), 1)
    cs, xs, ms = [], [], []
    for off in range(1, window + 1):
        b = jnp.roll(toks, -off, axis=1)
        keep_b = jnp.roll(keep, -off, axis=1)
        m = ((col < L - off) & (eff >= off) & keep & keep_b
             & row_valid[:, None])
        cs += [toks, b]
        xs += [b, toks]
        ms += [m, m]
    centers = jnp.concatenate(cs, axis=0).reshape(-1)
    contexts = jnp.concatenate(xs, axis=0).reshape(-1)
    mask = jnp.concatenate(ms, axis=0).reshape(-1).astype(jnp.float32)
    return centers, contexts, mask


def _build_alias(probs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Vose alias tables for O(1)-per-draw sampling of ``probs``.

    Returns ``(alias, thresh)``: draw a uniform cell ``i`` in [0, V) and a
    uniform ``u`` in [0, 1); the sample is ``i`` if ``u < thresh[i]`` else
    ``alias[i]``.  Exact: each cell carries 1/V total mass split between
    its own index and one alias, so
    ``probs[i] == (thresh[i] + sum(1 - thresh[j] for alias[j] == i)) / V``
    (asserted in ``test_alias_tables_reconstruct_distribution``).

    Replaces per-draw ``searchsorted`` over the cumulative distribution in
    the device SGNS chunk: the binary search cost 113 ms per 655k draws on
    v5e (log2(V) dependent gathers per draw) vs ~2 table gathers here.
    """
    probs = np.asarray(probs, np.float64)
    V = len(probs)
    scaled = probs * V
    alias = np.arange(V, dtype=np.int32)
    thresh = np.ones(V, np.float32)
    small = [i for i in range(V) if scaled[i] < 1.0]
    large = [i for i in range(V) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        big = large.pop()
        thresh[s] = scaled[s]
        alias[s] = big
        scaled[big] = (scaled[big] + scaled[s]) - 1.0
        (small if scaled[big] < 1.0 else large).append(big)
    return alias, thresh


@partial(jax.jit,
         static_argnames=("window", "negative", "slab_rows", "n_slabs"),
         donate_argnums=(0, 1))
def _sgns_device_chunk(syn0, syn1, corpus, row_perm, n_rows, start_slab,
                       global_start, key, keep_prob, neg_alias, neg_thresh,
                       alpha, min_alpha, total_slabs,
                       *, window, negative, slab_rows, n_slabs):
    """``n_slabs`` fully on-device SGNS steps under one ``lax.scan``.

    The corpus and the epoch's row permutation stay resident in HBM; each
    scan step slices ``slab_rows`` rows, generates dynamic windows,
    subsampling keeps, and unigram^0.75 negatives (alias method — see
    :func:`_build_alias`) with on-device RNG, and applies the masked
    skip-gram update.  The host's only per-chunk work is this one
    dispatch — nothing is transferred.
    """
    V = neg_alias.shape[0]

    def body(carry, i):
        s0, s1 = carry
        slab = start_slab + i
        rows = jax.lax.dynamic_slice_in_dim(
            row_perm, slab * slab_rows, slab_rows)
        row_valid = slab * slab_rows + jnp.arange(slab_rows) < n_rows
        toks = corpus[rows]
        k = jax.random.fold_in(key, slab)
        k_pair, k_cell, k_u = jax.random.split(k, 3)
        centers, contexts, mask = _device_pair_slab(
            toks, row_valid, k_pair, keep_prob, window)
        cell = jax.random.randint(
            k_cell, (centers.shape[0], negative), 0, V)
        u = jax.random.uniform(k_u, (centers.shape[0], negative))
        neg = jnp.where(u < neg_thresh[cell], cell, neg_alias[cell])
        frac = (global_start + i) / total_slabs
        lr = (alpha - (alpha - min_alpha) * frac).astype(jnp.float32)
        s0, s1 = _sgd_core(s0, s1, centers, contexts, neg, lr, mask)
        return (s0, s1), None

    (syn0, syn1), _ = jax.lax.scan(
        body, (syn0, syn1), jnp.arange(n_slabs))
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


def _train_device(syn0, syn1, corpus_ranked, keep_prob, neg_probs, rng,
                  *, window, negative, iterations, alpha, min_alpha,
                  batch_pairs, seed, slabs_per_dispatch):
    """Host driver for the device-resident SGNS pipeline.

    Per epoch the host does exactly two things: draw one row
    permutation and dispatch ``slabs_per_dispatch``-step scan chunks.
    All pair/negative generation and the SGD updates run on device."""
    R, L = corpus_ranked.shape
    slots = _pair_slots_per_row(L, window)
    if batch_pairs is None:
        batch_pairs = 1 << 17          # potential slots/step (~55k real)
    slab_rows = int(np.clip(batch_pairs // max(slots, 1), 1, R))
    slabs_per_epoch = -(-R // slab_rows)
    total_slabs = slabs_per_epoch * iterations

    corpus_dev = jax.device_put(corpus_ranked.astype(np.int32))
    V = syn0.shape[0]
    keep_dev = jax.device_put(
        keep_prob if keep_prob is not None
        else np.ones(V, np.float32))
    alias, thresh = _build_alias(neg_probs)
    alias_dev = jax.device_put(alias)
    thresh_dev = jax.device_put(thresh)

    global_slab = 0
    for it in range(iterations):
        perm = rng.permutation(R)
        pad = slabs_per_epoch * slab_rows - R
        perm = np.concatenate(
            [perm, np.zeros(pad, np.int64)]).astype(np.int32)
        perm_dev = jax.device_put(perm)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), it)
        s = 0
        while s < slabs_per_epoch:
            n = min(slabs_per_dispatch, slabs_per_epoch - s)
            syn0, syn1 = _sgns_device_chunk(
                syn0, syn1, corpus_dev, perm_dev,
                np.int32(R), np.int32(s), np.int32(global_slab + s),
                key, keep_dev, alias_dev, thresh_dev,
                np.float32(alpha), np.float32(min_alpha),
                np.float32(total_slabs),
                window=window, negative=negative,
                slab_rows=slab_rows, n_slabs=n)
            s += n
        global_slab += slabs_per_epoch
    return syn0


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
    device_pipeline: bool = False,
    slabs_per_dispatch: int = 32,
) -> Word2VecResult:
    """Train embeddings over a walk corpus; rows count-sorted like gensim.

    ``device_pipeline=True`` keeps the whole SGNS stage on device (see
    the module docstring): same vocab ordering, subsampling formula,
    negative distribution, window rule, and masked-mean SGD math as the
    host pipeline — only the RNG stream and the shuffle granularity
    (row-order instead of global pair-order, i.e. gensim's own behavior)
    differ.  ``batch_pairs`` then budgets POTENTIAL pair slots per step
    (~55-60%% carry mask=1 under window-3 dynamic windows)."""
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

    if device_pipeline:
        syn0 = _train_device(
            syn0, syn1, corpus_ranked, keep_prob, neg_probs, rng,
            window=window, negative=negative, iterations=iterations,
            alpha=alpha, min_alpha=min_alpha, batch_pairs=batch_pairs,
            seed=seed, slabs_per_dispatch=slabs_per_dispatch)
        names = (
            [index_to_name[i] for i in order] if index_to_name is not None
            else [int(i) for i in order]
        )
        return Word2VecResult(vectors=np.asarray(syn0),
                              index_to_word=names, counts=counts_sorted)

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
