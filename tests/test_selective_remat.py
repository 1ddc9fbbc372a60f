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


@pytest.mark.parametrize("mode", ["full", "attention", "unroll"])
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


def test_unroll_matches_scan_with_dropout():
    """remat="unroll" claims an RNG stream identical to the lax.scan path
    (bert.encode docstring) — verify under live dropout: same dropout_rng
    must give bit-identical loss and gradients in both modes."""
    params = fast_init(
        lambda: stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), CFG))
    batch = _batch(np.random.default_rng(1))
    drng = jax.random.PRNGKey(7)

    def loss(params, remat):
        l, _ = stonkgs.pretraining_loss(
            params, CFG, batch, remat=remat, deterministic=False,
            dropout_rng=drng)
        return l

    l0, g0 = jax.value_and_grad(loss)(params, False)
    l1, g1 = jax.value_and_grad(loss)(params, "unroll")
    assert abs(float(l0) - float(l1)) < 1e-6
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_unroll_cls_only_matches_scan():
    """The unroll mode's cls_only tail (last layer at the [CLS] query
    only) must equal the scan path's."""
    from stonkgs_tpu.models import bert

    params = fast_init(
        lambda: stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), CFG))
    bc = CFG.bert
    rng = np.random.default_rng(3)
    B, S = 4, CFG.seq_len
    hidden = jnp.asarray(rng.normal(size=(B, S, bc.hidden_size)),
                         jnp.float32)
    mask = jnp.ones((B, S), jnp.int32)
    out_scan = bert.encode(params["trunk"], bc, hidden, mask,
                           cls_only=True, remat=False)
    out_unroll = bert.encode(params["trunk"], bc, hidden, mask,
                             cls_only=True, remat="unroll")
    np.testing.assert_allclose(np.asarray(out_scan),
                               np.asarray(out_unroll),
                               atol=1e-6, rtol=1e-5)


def test_bigbird_remat_attention_matches_no_remat():
    """Selective (attention-only) remat in the BigBird trunk must not
    change values or gradients (block-sparse Pallas/XLA path)."""
    from stonkgs_tpu.config import BigBirdConfig, ProtSTonKGsConfig
    from stonkgs_tpu.models import protstonkgs

    cfg = ProtSTonKGsConfig(
        trunk=BigBirdConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
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
    params = fast_init(
        lambda: protstonkgs.init_protstonkgs_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    n = 4
    mlm = np.full((n, 12), -100, np.int64)
    elm = np.full((n, 4), -100, np.int64)
    plm = np.full((n, 16), -100, np.int64)
    mlm[:, 1:3] = rng.integers(0, 128, (n, 2))
    elm[:, 0] = rng.integers(0, 150, n)
    plm[:, 2:4] = rng.integers(0, 30, (n, 2))
    batch = {
        "input_ids": jnp.asarray(np.concatenate(
            [rng.integers(0, 128, (n, 12)), rng.integers(0, 150, (n, 4)),
             rng.integers(0, 30, (n, 16))], 1)),
        "attention_mask": jnp.ones((n, 32), jnp.float32),
        "masked_lm_labels": jnp.asarray(mlm),
        "ent_masked_lm_labels": jnp.asarray(elm),
        "prot_masked_lm_labels": jnp.asarray(plm),
    }

    def loss(params, remat):
        l, _ = protstonkgs.pretraining_loss(
            params, cfg, batch, remat=remat, deterministic=True)
        return l

    l0, g0 = jax.value_and_grad(loss)(params, False)
    l1, g1 = jax.value_and_grad(loss)(params, "attention")
    l2, g2 = jax.value_and_grad(loss)(params, True)
    assert abs(float(l0) - float(l1)) < 1e-6
    assert abs(float(l0) - float(l2)) < 1e-6
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
