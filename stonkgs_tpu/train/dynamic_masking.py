"""On-device dynamic masking + NSP pairing for pre-training.

The reference masks its corpus ONCE during preprocessing
(``indra_for_pretraining.py``): every epoch sees identical corruptions and
appends int(0.25·n) corrupted COPIES (final mix: 20% NSP negatives, every
positive retained).  This wrapper applies the same 80/10/10 masking and
NSP pairing INSIDE the jitted train step with fresh per-step randomness
(RoBERTa-style dynamic masking): the stored dataset stays uncorrupted and
every epoch sees new corruptions.  NSP negatives are created by swapping
rows IN PLACE (a batch cannot grow inside the step), so the default
``nsp_negative_proportion=0.2`` matches the reference's 20% class prior;
a swapped row's own positive pairing is seen on other steps instead of
the same one.

Usage: preprocess with ``apply_masking=False`` (raw token ids, NSP label 0)
and pass ``loss_fn=dynamic_masking_loss()`` to ``pretrain``/``make_train_step``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from stonkgs_tpu.data.masking import mask_tokens_jax
from stonkgs_tpu.models import stonkgs


def dynamic_nsp_swap(key, input_ids, ent_labels, text_len: int,
                     negative_proportion: float = 0.2):
    """Swap the entity half (and its ELM labels) of ~``negative_proportion``
    of rows with a random partner row; NSP label 1 (reference
    ``_add_negative_nsp_samples`` class prior — 0.25n appended negatives
    over 1.25n rows = 20% — applied per batch instead of per dataset)."""
    B = input_ids.shape[0]
    k_sel, k_perm = jax.random.split(key)
    is_neg = jax.random.uniform(k_sel, (B,)) < negative_proportion
    partner = jax.random.permutation(k_perm, B)
    ent = input_ids[:, text_len:]
    swapped_ent = jnp.where(is_neg[:, None], ent[partner], ent)
    swapped_labels = jnp.where(is_neg[:, None], ent_labels[partner], ent_labels)
    input_ids = jnp.concatenate([input_ids[:, :text_len], swapped_ent], axis=1)
    nsp = is_neg.astype(jnp.int32)
    return input_ids, swapped_labels, nsp


def dynamic_masking_loss(
    *,
    base_loss: Callable = stonkgs.pretraining_loss,
    mask_id: int = 103,
    masked_tokens_percentage: float = 0.15,
    nsp_negative_proportion: Optional[float] = 0.2,
) -> Callable:
    """Loss wrapper applying masking (+ optional NSP pairing) on device.

    Expects batches with RAW ``input_ids`` (no pre-applied corruption);
    label columns are generated on the fly."""

    def loss(params, cfg, batch, *, dropout_rng=None, **kw):
        assert dropout_rng is not None, "dynamic masking needs a PRNG key"
        k_text, k_ent, k_nsp, k_drop = jax.random.split(dropout_rng, 4)
        text = batch["input_ids"][:, : cfg.text_len]
        ent = batch["input_ids"][:, cfg.text_len:]
        text_m, mlm_labels = mask_tokens_jax(
            k_text, text.astype(jnp.int32), cfg.bert.vocab_size,
            mask_id, masked_tokens_percentage)
        ent_m, elm_labels = mask_tokens_jax(
            k_ent, ent.astype(jnp.int32), cfg.kg_vocab_size,
            mask_id, masked_tokens_percentage)
        input_ids = jnp.concatenate([text_m, ent_m], axis=1)
        if nsp_negative_proportion:
            input_ids, elm_labels, nsp = dynamic_nsp_swap(
                k_nsp, input_ids, elm_labels, cfg.text_len,
                nsp_negative_proportion)
        else:
            nsp = jnp.zeros(input_ids.shape[0], jnp.int32)
        new_batch = {
            **batch,
            "input_ids": input_ids,
            "masked_lm_labels": mlm_labels,
            "ent_masked_lm_labels": elm_labels,
            "next_sentence_labels": nsp,
        }
        return base_loss(params, cfg, new_batch, dropout_rng=k_drop, **kw)

    return loss
