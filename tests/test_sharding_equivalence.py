"""Sharded-vs-single-device numerical equivalence of the train step.

The {data, model} sharding must not change the math: two steps on a 4x2
mesh produce (within fp32 reduction-order noise) the same parameters as the
same two steps on one device.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.parallel.mesh import (
    make_mesh, replicate_unsharded, shard_batch, shard_params,
)
from stonkgs_tpu.train.optimizer import make_optimizer
from stonkgs_tpu.train.pretraining import init_train_state, make_train_step

CFG = STonKGsConfig(
    bert=BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=32,
                    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0),
    kg_vocab_size=160, text_len=16, entity_len=16)


def _params():
    p = stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), CFG)
    p["kg_backbone"] = jax.random.normal(
        jax.random.PRNGKey(1), (CFG.kg_table_size, 32))
    return p


def _batch(seed):
    rng = np.random.default_rng(seed)
    n = 8
    mlm = np.full((n, 16), -100, np.int64)
    elm = np.full((n, 16), -100, np.int64)
    mlm[:, 2:4] = rng.integers(0, 128, (n, 2))
    elm[:, 5:7] = rng.integers(0, 160, (n, 2))
    return {
        "input_ids": np.concatenate(
            [rng.integers(0, 128, (n, 16)), rng.integers(0, 160, (n, 16))], 1),
        "attention_mask": np.ones((n, 32), np.int64),
        "token_type_ids": np.concatenate(
            [np.zeros((n, 16), np.int64), np.ones((n, 16), np.int64)], 1),
        "masked_lm_labels": mlm,
        "ent_masked_lm_labels": elm,
        "next_sentence_labels": rng.integers(0, 2, (n,)),
    }


def _run(mesh, fsdp=False, attention_impl="xla"):
    params = _params()
    if mesh is not None:
        params = shard_params(params, mesh, fsdp=fsdp, fsdp_min_size=512)
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=4)
    state = init_train_state(params, tx, seed=7)
    if mesh is not None:
        state = dataclasses.replace(
            state,
            step=replicate_unsharded(state.step, mesh),
            rng=replicate_unsharded(state.rng, mesh),
            opt_state=replicate_unsharded(state.opt_state, mesh),
        )
    step_fn = make_train_step(CFG, tx, compute_dtype=jnp.float32,
                              mesh=mesh, donate=False,
                              attention_impl=attention_impl)
    losses = []
    for s in range(2):
        batch = _batch(s)
        batch = (shard_batch(batch, mesh) if mesh is not None
                 else {k: jnp.asarray(v) for k, v in batch.items()})
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    return state, losses


def test_sharded_step_matches_single_device():
    state_1, losses_1 = _run(None)
    state_s, losses_s = _run(make_mesh(n_data=4, n_model=2))

    np.testing.assert_allclose(losses_s, losses_1, rtol=1e-5)
    # trainable params identical up to reduction-order noise
    for path in (("trunk", "pooler", "kernel"),
                 ("trunk", "encoder", "attention", "query", "kernel"),
                 ("cls", "seq_relationship", "kernel")):
        a, b = state_1.params, state_s.params
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-6, rtol=1e-5,
                                   err_msg="/".join(path))
    # sharded decoder: compare the unpadded slice
    dec_1 = np.asarray(state_1.params["cls"]["predictions"]["entity_decoder"]["kernel"])
    dec_s = np.asarray(state_s.params["cls"]["predictions"]["entity_decoder"]["kernel"])
    np.testing.assert_allclose(dec_s[:, : dec_1.shape[1]], dec_1,
                               atol=2e-6, rtol=1e-5)


def test_sharded_flash_attention_matches_single_device():
    """impl=("flash", mesh): the Pallas kernel under shard_map over the
    data axis must reproduce the single-device flash step."""
    state_1, losses_1 = _run(None, attention_impl="flash")
    mesh = make_mesh(n_data=4, n_model=2)
    state_s, losses_s = _run(mesh, attention_impl=("flash", mesh))

    np.testing.assert_allclose(losses_s, losses_1, rtol=1e-5)
    a = state_1.params["trunk"]["encoder"]["attention"]["query"]["kernel"]
    b = state_s.params["trunk"]["encoder"]["attention"]["query"]["kernel"]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=2e-6, rtol=1e-5)


def test_fsdp_step_matches_single_device():
    """ZeRO-3-style full param sharding must not change the math, and the
    optimizer moments must inherit the data-axis shardings."""
    state_1, losses_1 = _run(None)
    state_f, losses_f = _run(make_mesh(n_data=4, n_model=2), fsdp=True)

    np.testing.assert_allclose(losses_f, losses_1, rtol=1e-5)
    for path in (("trunk", "encoder", "attention", "query", "kernel"),
                 ("trunk", "embeddings", "word_embeddings"),
                 ("cls", "seq_relationship", "kernel")):
        a, b = state_1.params, state_f.params
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-6, rtol=1e-5,
                                   err_msg="/".join(path))

    # params AND AdamW moments are actually sharded over the data axis
    from jax.sharding import PartitionSpec as P

    def spec_of(x):
        return getattr(x.sharding, "spec", P())

    qk = state_f.params["trunk"]["encoder"]["attention"]["query"]["kernel"]
    assert "data" in tuple(spec_of(qk)), spec_of(qk)
    sharded_moments = [
        s for s in jax.tree.leaves(
            state_f.opt_state, is_leaf=lambda x: hasattr(x, "sharding"))
        if hasattr(s, "sharding") and "data" in tuple(spec_of(s))
    ]
    assert sharded_moments, "no optimizer moment is data-sharded under fsdp"
