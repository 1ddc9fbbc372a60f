"""Selective remat ("attention") must not change values or gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.utils.init import fast_init

CFG = STonKGsConfig(
    bert=BertConfig(
        vocab_size=97, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32,
    ),
    kg_vocab_size=111, text_len=16, entity_len=16,
)


def _batch(rng, B=4):
    text = rng.integers(0, CFG.bert.vocab_size, (B, CFG.text_len))
    ent = rng.integers(0, CFG.kg_vocab_size, (B, CFG.entity_len))
    mlm = np.full((B, CFG.text_len), -100, np.int64)
    elm = np.full((B, CFG.entity_len), -100, np.int64)
    mlm[:, 1:3] = rng.integers(0, CFG.bert.vocab_size, (B, 2))
    elm[:, 2:4] = rng.integers(0, CFG.kg_vocab_size, (B, 2))
    return {
        "input_ids": jnp.asarray(np.concatenate([text, ent], 1)),
        "attention_mask": jnp.ones((B, CFG.seq_len), jnp.int32),
        "token_type_ids": jnp.asarray(np.concatenate(
            [np.zeros((B, CFG.text_len), np.int64),
             np.ones((B, CFG.entity_len), np.int64)], 1)),
        "masked_lm_labels": jnp.asarray(mlm),
        "ent_masked_lm_labels": jnp.asarray(elm),
        "next_sentence_labels": jnp.asarray(rng.integers(0, 2, (B,))),
    }


@pytest.mark.parametrize("mode", ["full", "attention"])
def test_remat_mode_matches_no_remat(mode):
    params = fast_init(
        lambda: stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), CFG))
    batch = _batch(np.random.default_rng(0))

    def loss(params, remat):
        l, _ = stonkgs.pretraining_loss(
            params, CFG, batch, remat=remat, deterministic=True)
        return l

    l0, g0 = jax.value_and_grad(loss)(params, False)
    l1, g1 = jax.value_and_grad(loss)(params, mode)
    assert abs(float(l0) - float(l1)) < 1e-6
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
