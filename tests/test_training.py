"""Training engine tests on a virtual 8-device CPU mesh.

Covers: sharded {data, model} train step, frozen backbones, gradient
accumulation equivalence, and Orbax checkpoint save/auto-resume — the
TPU-native equivalents of accelerate/DeepSpeed + HF Trainer resume
(SURVEY.md §2.2, §5.3/5.4).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.parallel.mesh import (
    MODEL_AXIS, make_mesh, param_shardings, shard_batch, shard_params,
)
from stonkgs_tpu.train.optimizer import make_optimizer, trainable_mask
from stonkgs_tpu.train.pretraining import (
    PretrainingConfig, data_iterator, init_train_state, make_train_step,
)

TINY = BertConfig(
    vocab_size=128, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=64, max_position_embeddings=32,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
)
CFG = STonKGsConfig(bert=TINY, kg_vocab_size=160, text_len=16, entity_len=16)


def _params(seed=0):
    key = jax.random.PRNGKey(seed)
    p = stonkgs.init_stonkgs_params(key, CFG)
    p["kg_backbone"] = jax.random.normal(key, (CFG.kg_table_size, 32), jnp.float32)
    return p


def _features(n=64, seed=0):
    rng = np.random.default_rng(seed)
    text = rng.integers(0, 128, (n, 16))
    ent = rng.integers(0, 160, (n, 16))
    mlm = np.full((n, 16), -100, np.int64)
    elm = np.full((n, 16), -100, np.int64)
    mlm[:, 2:4] = rng.integers(0, 128, (n, 2))
    elm[:, 5:7] = rng.integers(0, 160, (n, 2))
    return {
        "input_ids": np.concatenate([text, ent], 1),
        "attention_mask": np.ones((n, 32), np.int64),
        "token_type_ids": np.concatenate(
            [np.zeros((n, 16), np.int64), np.ones((n, 16), np.int64)], 1),
        "masked_lm_labels": mlm,
        "ent_masked_lm_labels": elm,
        "next_sentence_labels": rng.integers(0, 2, (n,)),
    }


def test_mesh_and_shardings():
    assert len(jax.devices()) == 8
    mesh = make_mesh(n_data=4, n_model=2)
    params = shard_params(_params(), mesh)
    kg_sh = params["kg_backbone"].sharding
    assert MODEL_AXIS in kg_sh.spec  # table sharded over model axis
    ent_dec = params["cls"]["predictions"]["entity_decoder"]["kernel"]
    assert ent_dec.sharding.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    # replicated example
    q = params["trunk"]["encoder"]["attention"]["query"]["kernel"]
    assert q.sharding.spec == jax.sharding.PartitionSpec()


def test_sharded_train_step_runs_and_freezes_backbones():
    mesh = make_mesh(n_data=4, n_model=2)
    params = shard_params(_params(), mesh)  # pads vocab dims to multiples
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=10)
    state = init_train_state(params, tx)
    step_fn = make_train_step(CFG, tx, compute_dtype=jnp.float32, mesh=mesh)

    lm_before = np.asarray(
        state.params["lm_backbone"]["embeddings"]["word_embeddings"])
    kg_before = np.asarray(state.params["kg_backbone"])
    trunk_before = np.asarray(
        state.params["trunk"]["encoder"]["attention"]["query"]["kernel"])

    losses = []
    it = data_iterator(_features(), 8)
    for _ in range(5):
        batch = shard_batch(next(it), mesh)
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))

    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # learning something
    # frozen backbones unchanged (stonkgs_model.py:113-114 semantics)
    np.testing.assert_array_equal(
        np.asarray(state.params["lm_backbone"]["embeddings"]["word_embeddings"]),
        lm_before)
    np.testing.assert_array_equal(np.asarray(state.params["kg_backbone"]), kg_before)
    # trainable trunk did change
    assert not np.array_equal(
        np.asarray(state.params["trunk"]["encoder"]["attention"]["query"]["kernel"]),
        trunk_before)


def test_grad_accumulation_equivalence():
    params = _params()
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=10,
                        max_grad_norm=None)
    feats = _features(16)
    batch = {k: jnp.asarray(v) for k, v in feats.items()}

    s1 = init_train_state(params, tx)
    step1 = make_train_step(CFG, tx, compute_dtype=jnp.float32,
                            grad_accumulation_steps=1, donate=False)
    s1, m1 = step1(s1, batch)

    s2 = init_train_state(params, tx)
    step2 = make_train_step(CFG, tx, compute_dtype=jnp.float32,
                            grad_accumulation_steps=4, donate=False)
    s2, m2 = step2(s2, batch)

    # deterministic=False but dropout prob is 0 -> only grads matter.
    # mean-of-micro-batch losses == full-batch loss for equal micro sizes
    # except CE normalization by valid-count differs only if counts differ;
    # here every row has the same number of masked positions.
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    p1 = np.asarray(s1.params["trunk"]["pooler"]["kernel"])
    p2 = np.asarray(s2.params["trunk"]["pooler"]["kernel"])
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_checkpoint_save_and_resume(tmp_path):
    from stonkgs_tpu.train.checkpoint import CheckpointManager

    params = _params()
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=10)
    state = init_train_state(params, tx)
    step_fn = make_train_step(CFG, tx, compute_dtype=jnp.float32, donate=False)
    it = data_iterator(_features(), 8)
    for _ in range(3):
        state, _ = step_fn(state, {k: jnp.asarray(v) for k, v in next(it).items()})

    mngr = CheckpointManager(str(tmp_path / "ckpt"), save_total_limit=2)
    mngr.save(3, state)
    assert mngr.latest_step() == 3

    fresh = init_train_state(_params(seed=1), tx)
    restored = mngr.restore_latest(fresh)
    assert restored is not None
    assert int(restored.step) == 3
    np.testing.assert_allclose(
        np.asarray(restored.params["trunk"]["pooler"]["kernel"]),
        np.asarray(state.params["trunk"]["pooler"]["kernel"]),
    )
    # rotation: keep only save_total_limit checkpoints
    mngr.save(4, state)
    mngr.save(5, state)
    assert mngr.latest_step() == 5


def test_trainable_mask_labels():
    params = _params()
    labels = trainable_mask(params)
    assert labels["lm_backbone"]["pooler"]["kernel"] == "frozen"
    assert labels["kg_backbone"] == "frozen"
    assert labels["trunk"]["pooler"]["kernel"] == "train"
    assert labels["cls"]["predictions"]["text_decoder"]["kernel"] == "train"
