"""cls_only last-layer optimization: identical pooled output, less work."""

import numpy as np

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.utils.init import fast_init

CFG = STonKGsConfig(
    bert=BertConfig(vocab_size=130, hidden_size=32, num_hidden_layers=3,
                    num_attention_heads=4, intermediate_size=64,
                    max_position_embeddings=40),
    kg_vocab_size=140, text_len=20, entity_len=20, num_labels=4,
)


def _setup(seed=0):
    params = fast_init(lambda: stonkgs.init_stonkgs_params(
        jax.random.PRNGKey(0), CFG, with_classifier=True))
    rng = np.random.default_rng(seed)
    B = 3
    text = rng.integers(0, CFG.bert.vocab_size, (B, CFG.text_len))
    ent = rng.integers(0, CFG.kg_table_size, (B, CFG.entity_len))
    mask = np.ones((B, CFG.seq_len), np.int32)
    mask[:, CFG.text_len - 4: CFG.text_len] = 0
    batch = {
        "input_ids": jnp.asarray(np.concatenate([text, ent], 1)),
        "attention_mask": jnp.asarray(mask),
        "token_type_ids": jnp.asarray(np.concatenate(
            [np.zeros((B, CFG.text_len), np.int32),
             np.ones((B, CFG.entity_len), np.int32)], 1)),
    }
    return params, batch


def test_pooler_output_matches_full_path():
    params, batch = _setup()
    fast = stonkgs.pooler_output(params, CFG, batch)          # cls_only auto
    full = stonkgs.pooler_output(params, CFG, batch, cls_only=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                               atol=1e-6, rtol=1e-6)


def test_classification_logits_match_full_path():
    params, batch = _setup(1)
    fast = stonkgs.classification_logits(params, CFG, batch)
    full = stonkgs.classification_logits(params, CFG, batch, cls_only=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                               atol=1e-6, rtol=1e-6)


def test_bigbird_cls_only_matches_full_path():
    """BigBird pooled output with cls_only == full path, in BOTH attention
    modes (the [CLS] row is dense even under block-sparse — HF part 1)."""
    from stonkgs_tpu.config import BigBirdConfig
    from stonkgs_tpu.models import bigbird
    from stonkgs_tpu.ops.bigbird_sparse import build_rand_attn

    cfg = BigBirdConfig(
        vocab_size=90, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=160, attention_type="block_sparse",
        block_size=16, num_random_blocks=2,
    )
    params = fast_init(lambda: bigbird.init_bigbird_params(
        jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(3)
    B, S = 2, 160  # 10 blocks of 16 -> real block-sparse path
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)))
    mask = np.ones((B, S), np.float32)
    mask[:, -20:] = 0.0
    mask = jnp.asarray(mask)
    plan = build_rand_attn(S, cfg.block_size, cfg.num_random_blocks,
                           cfg.num_attention_heads, cfg.num_hidden_layers,
                           cfg.max_position_embeddings, training=False)

    for attn_type in ("block_sparse", "original_full"):
        _, full = bigbird.bigbird_model(
            params, cfg, input_ids=ids, attention_mask=mask,
            rand_attn=plan, attention_type=attn_type,
            attention_impl="xla", sparse_impl="xla")
        _, fast = bigbird.bigbird_model(
            params, cfg, input_ids=ids, attention_mask=mask,
            rand_attn=plan, attention_type=attn_type,
            attention_impl="xla", sparse_impl="xla", cls_only=True)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(full), atol=2e-6, rtol=1e-5,
            err_msg=attn_type)


def test_training_path_keeps_full_last_layer():
    """deterministic=False must not enable cls_only (dropout needs the
    full-path rng stream); the call simply runs without the assert."""
    params, batch = _setup(2)
    b = dict(batch, labels=jnp.asarray(np.array([0, 1, 2])))
    loss, _ = stonkgs.classification_loss(
        params, CFG, b, deterministic=False,
        dropout_rng=jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
