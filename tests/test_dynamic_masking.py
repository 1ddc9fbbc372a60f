"""Dynamic on-device masking/NSP wrapper tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.train.dynamic_masking import dynamic_masking_loss, dynamic_nsp_swap
from stonkgs_tpu.train.optimizer import make_optimizer
from stonkgs_tpu.train.pretraining import init_train_state, make_train_step

CFG = STonKGsConfig(
    bert=BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=32, hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0),
    kg_vocab_size=150, text_len=16, entity_len=16)


def _raw_batch(n=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": jnp.asarray(np.concatenate(
            [rng.integers(0, 128, (n, 16)), rng.integers(0, 150, (n, 16))], 1)),
        "attention_mask": jnp.ones((n, 32), jnp.int32),
        "token_type_ids": jnp.asarray(np.concatenate(
            [np.zeros((n, 16), np.int32), np.ones((n, 16), np.int32)], 1)),
    }


def test_nsp_swap_properties():
    key = jax.random.PRNGKey(0)
    batch = _raw_batch(64)
    ent_labels = jnp.full((64, 16), -100, jnp.int32)
    ids, labels, nsp = dynamic_nsp_swap(key, batch["input_ids"], ent_labels, 16)
    frac = float(nsp.mean())
    assert 0.1 < frac < 0.4  # ~25% negatives
    # text half untouched
    np.testing.assert_array_equal(
        np.asarray(ids[:, :16]), np.asarray(batch["input_ids"][:, :16]))
    # positive rows keep their entity half
    pos = np.asarray(nsp) == 0
    np.testing.assert_array_equal(
        np.asarray(ids)[pos, 16:], np.asarray(batch["input_ids"])[pos, 16:])


def test_dynamic_loss_trains_and_changes_masks():
    params = stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), CFG)
    params["kg_backbone"] = jax.random.normal(
        jax.random.PRNGKey(1), (CFG.kg_table_size, 32))
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=4)
    state = init_train_state(params, tx)
    step_fn = make_train_step(
        CFG, tx, loss_fn=dynamic_masking_loss(),
        compute_dtype=jnp.float32, donate=False,
    )
    batch = _raw_batch()
    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # fresh randomness per step: identical inputs give different loss values
    assert len({round(v, 6) for v in losses}) > 1
    assert float(metrics["nsp_loss"]) > 0
