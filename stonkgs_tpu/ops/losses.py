"""Loss functions with torch-``CrossEntropyLoss`` semantics.

The reference computes MLM/ELM/NSP losses with ``nn.CrossEntropyLoss()``
(mean over non-ignored targets, ignore_index=-100) over *dense* logits of
shape (B, S, vocab) (``/root/reference/src/stonkgs/models/stonkgs_model.py:
229-245``).  For the huge KG vocabulary that materializes gigabytes of
logits; the TPU-native path instead gathers the (fixed, ~15%) masked
positions first and only decodes those — see ``gather_masked_positions``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

IGNORE_INDEX = -100


def masked_cross_entropy(
    logits: Array,   # (..., V)
    labels: Array,   # (...,) int, IGNORE_INDEX to skip
    *,
    label_weights: Optional[Array] = None,
) -> Array:
    """Mean cross entropy over positions where labels != IGNORE_INDEX.

    Matches ``torch.nn.CrossEntropyLoss(ignore_index=-100)`` (reduction
    ``mean``) except that an all-ignored batch yields 0 instead of NaN.
    """
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    logits_f = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits_f, axis=-1)
    target = jnp.take_along_axis(logits_f, safe_labels[..., None], axis=-1)[..., 0]
    nll = lse - target
    w = valid.astype(jnp.float32)
    if label_weights is not None:
        w = w * label_weights
    total = jnp.sum(nll * w)
    count = jnp.sum(w)
    return total / jnp.maximum(count, 1.0)


def weighted_cross_entropy(logits: Array, labels: Array, class_weights: Array) -> Array:
    """torch ``CrossEntropyLoss(weight=...)``: sum(w_y * nll) / sum(w_y).

    Used by the KG baseline (reference: ``kg_baseline_model.py:105-115``).
    """
    logits_f = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits_f, axis=-1)
    target = jnp.take_along_axis(logits_f, labels[..., None], axis=-1)[..., 0]
    nll = lse - target
    w = class_weights[labels]
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-9)


def mse_loss(preds: Array, targets: Array) -> Array:
    return jnp.mean(jnp.square(preds.astype(jnp.float32) - targets.astype(jnp.float32)))


def bce_with_logits(logits: Array, targets: Array) -> Array:
    """torch BCEWithLogitsLoss semantics (mean reduction, fp32)."""
    z = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.mean(jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z))))


def gather_masked_positions(
    hidden: Array,        # (B, S, H)
    labels: Array,        # (B, S) with IGNORE_INDEX on unmasked positions
    max_predictions: int,
) -> Tuple[Array, Array, Array]:
    """Gather the hidden states of masked positions.

    Returns (gathered_hidden (B, K, H), gathered_labels (B, K),
    valid_mask (B, K)).  K = max_predictions.  The data pipeline masks a
    fixed fraction (int(0.15*S) positions per row, reference
    ``indra_for_pretraining.py:55-58``), so K can be chosen exactly; extra
    slots carry IGNORE_INDEX and weight 0.
    """
    is_masked = labels != IGNORE_INDEX
    # top_k over int mask is stable enough: prefer masked positions, then
    # earliest index (jax.lax.top_k breaks ties by lowest index).
    _, positions = jax.lax.top_k(is_masked.astype(jnp.int32), max_predictions)
    gathered = jnp.take_along_axis(hidden, positions[..., None], axis=1)
    g_labels = jnp.take_along_axis(labels, positions, axis=1)
    valid = jnp.take_along_axis(is_masked, positions, axis=1)
    g_labels = jnp.where(valid, g_labels, IGNORE_INDEX)
    return gathered, g_labels, valid
