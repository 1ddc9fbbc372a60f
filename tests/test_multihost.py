"""Multi-host helpers (single-process degradation + sharded batches)."""

import numpy as np

import jax
import jax.numpy as jnp

from stonkgs_tpu.parallel.mesh import DATA_AXIS, make_mesh
from stonkgs_tpu.parallel.multihost import (
    global_batch, host_local_slice, initialize, multihost_data_iterator,
)


def test_initialize_noop_single_process():
    initialize()  # must not raise without coordinator env


def test_host_local_slice_single_process():
    assert host_local_slice(16) == slice(0, 16)


def test_global_batch_shards_over_mesh():
    mesh = make_mesh(n_data=8, n_model=1)
    feats = {"input_ids": np.arange(64).reshape(16, 4).astype(np.int32)}
    out = global_batch(feats, mesh)
    arr = out["input_ids"]
    assert arr.shape == (16, 4)
    assert DATA_AXIS in arr.sharding.spec
    np.testing.assert_array_equal(np.asarray(arr), feats["input_ids"])


def test_multihost_iterator_covers_epoch():
    mesh = make_mesh(n_data=4, n_model=1)
    n = 32
    feats = {"input_ids": np.arange(n)[:, None].astype(np.int32)}
    it = multihost_data_iterator(feats, global_batch_size=8, mesh=mesh, seed=0)
    seen = []
    for _ in range(n // 8):
        batch = next(it)
        seen.extend(np.asarray(batch["input_ids"]).ravel().tolist())
    assert sorted(seen) == list(range(n))  # full epoch, no dup/drop


def test_iterator_feeds_sharded_train_step():
    """End-to-end: multihost iterator -> sharded train step."""
    from stonkgs_tpu.config import BertConfig, STonKGsConfig
    from stonkgs_tpu.models import stonkgs
    from stonkgs_tpu.parallel.mesh import shard_params
    from stonkgs_tpu.train.optimizer import make_optimizer
    from stonkgs_tpu.train.pretraining import init_train_state, make_train_step

    cfg = STonKGsConfig(
        bert=BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=16, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0),
        kg_vocab_size=150, text_len=8, entity_len=8)
    mesh = make_mesh(n_data=4, n_model=2)
    params = shard_params(
        stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), cfg), mesh)
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=2)
    state = init_train_state(params, tx)
    import dataclasses

    from stonkgs_tpu.parallel.mesh import replicate_unsharded
    state = dataclasses.replace(
        state, step=replicate_unsharded(state.step, mesh),
        rng=replicate_unsharded(state.rng, mesh),
        opt_state=replicate_unsharded(state.opt_state, mesh))
    step_fn = make_train_step(cfg, tx, compute_dtype=jnp.float32, mesh=mesh)

    rng = np.random.default_rng(0)
    n = 16
    feats = {
        "input_ids": np.concatenate(
            [rng.integers(0, 128, (n, 8)), rng.integers(0, 150, (n, 8))], 1),
        "attention_mask": np.ones((n, 16), np.int64),
        "token_type_ids": np.concatenate(
            [np.zeros((n, 8), np.int64), np.ones((n, 8), np.int64)], 1),
        "masked_lm_labels": np.full((n, 8), -100, np.int64),
        "ent_masked_lm_labels": np.full((n, 8), -100, np.int64),
        "next_sentence_labels": rng.integers(0, 2, (n,)),
    }
    feats["masked_lm_labels"][:, 1] = rng.integers(0, 128, n)
    it = multihost_data_iterator(feats, global_batch_size=8, mesh=mesh, seed=0)
    for _ in range(2):
        state, metrics = step_fn(state, next(it))
    assert np.isfinite(float(metrics["loss"]))
