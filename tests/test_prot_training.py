"""ProtSTonKGs pre-training on a sharded mesh (tri-modality train step)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig, BigBirdConfig, ProtSTonKGsConfig
from stonkgs_tpu.models import protstonkgs
from stonkgs_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from stonkgs_tpu.train.optimizer import make_optimizer, trainable_mask
from stonkgs_tpu.train.pretraining import init_train_state, make_train_step

CFG = ProtSTonKGsConfig(
    trunk=BigBirdConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, block_size=4, num_random_blocks=1,
        attention_type="block_sparse",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0),
    lm=BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=64,
                  max_position_embeddings=8, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0),
    prot=BertConfig(vocab_size=30, hidden_size=16, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=32,
                    max_position_embeddings=16, hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0),
    lm_vocab_size=128, kg_vocab_size=150, prot_vocab_size=30,
    kg_start_idx=12, prot_start_idx=16, seq_len=32,
    sep_id=102, mask_id=103, unk_id=100,
)


def _batch(n=8, seed=0):
    rng = np.random.default_rng(seed)
    text = rng.integers(0, 128, (n, 12))
    ent = rng.integers(0, 150, (n, 4))
    prot = rng.integers(0, 30, (n, 16))
    mlm = np.full((n, 12), -100, np.int64)
    elm = np.full((n, 4), -100, np.int64)
    plm = np.full((n, 16), -100, np.int64)
    mlm[:, 1:3] = rng.integers(0, 128, (n, 2))
    elm[:, 0] = rng.integers(0, 150, n)
    plm[:, 2:4] = rng.integers(0, 30, (n, 2))
    return {
        "input_ids": np.concatenate([text, ent, prot], 1),
        "attention_mask": np.ones((n, 32), np.int64),
        "masked_lm_labels": mlm,
        "ent_masked_lm_labels": elm,
        "prot_masked_lm_labels": plm,
    }


def test_prot_pretraining_step_sharded():
    mesh = make_mesh(n_data=4, n_model=2)
    params = protstonkgs.init_protstonkgs_params(jax.random.PRNGKey(0), CFG)
    params["kg_backbone"] = jax.random.normal(
        jax.random.PRNGKey(1), (CFG.kg_table_size, 32))
    params = shard_params(params, mesh)
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=4)
    state = init_train_state(params, tx)
    from stonkgs_tpu.parallel.mesh import replicate_unsharded
    import dataclasses
    state = dataclasses.replace(
        state,
        step=replicate_unsharded(state.step, mesh),
        rng=replicate_unsharded(state.rng, mesh),
        opt_state=replicate_unsharded(state.opt_state, mesh),
    )
    step_fn = make_train_step(
        CFG, tx, loss_fn=protstonkgs.pretraining_loss,
        compute_dtype=jnp.float32, mesh=mesh,
    )
    lm_before = np.asarray(
        state.params["lm_backbone"]["embeddings"]["word_embeddings"])
    prot_before = np.asarray(
        state.params["prot_backbone"]["embeddings"]["word_embeddings"])
    proj_before = np.asarray(state.params["prot_projection"]["kernel"])

    losses = []
    for i in range(3):
        batch = shard_batch(_batch(seed=i), mesh)
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
        assert {"text_loss", "entity_loss", "prot_loss"} <= set(metrics)
    assert all(np.isfinite(losses))
    # LM + prot backbones frozen; the projection layer trains
    np.testing.assert_array_equal(
        np.asarray(state.params["lm_backbone"]["embeddings"]["word_embeddings"]),
        lm_before)
    np.testing.assert_array_equal(
        np.asarray(state.params["prot_backbone"]["embeddings"]["word_embeddings"]),
        prot_before)
    assert not np.array_equal(
        np.asarray(state.params["prot_projection"]["kernel"]), proj_before)


def test_prot_trainable_mask():
    params = protstonkgs.init_protstonkgs_params(jax.random.PRNGKey(0), CFG)
    labels = trainable_mask(params)
    assert labels["prot_backbone"]["pooler"]["kernel"] == "frozen"
    assert labels["lm_backbone"]["pooler"]["kernel"] == "frozen"
    assert labels["kg_backbone"] == "frozen"
    assert labels["prot_projection"]["kernel"] == "train"
    assert labels["trunk"]["pooler"]["kernel"] == "train"
