"""BigBird encoder parity vs HF torch (dense and block-sparse paths).

The ProtSTonKGs trunk is HF BigBird (``protstonkgs_model.py:137``); these
tests pin embeddings order (dropout-before-LayerNorm), the auto fallback to
full attention for short sequences, exact block-sparse attention at eval
(zero random blocks), and the training-mode random-plan RNG stream.
"""

import numpy as np
import pytest
import torch
import transformers

import jax.numpy as jnp

from stonkgs_tpu.config import BigBirdConfig
from stonkgs_tpu.models.bigbird import (
    bigbird_model, bigbird_params_from_state_dict, effective_attention_type,
)
from stonkgs_tpu.ops.bigbird_sparse import build_rand_attn

TINY = dict(
    vocab_size=99,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=256,
    type_vocab_size=2,
    block_size=16,
    num_random_blocks=2,
    attention_type="block_sparse",
    use_bias=True,
)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    hf_cfg = transformers.BigBirdConfig(**TINY)
    model = transformers.BigBirdModel(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_setup(torch_model):
    cfg = BigBirdConfig(**TINY)
    params = bigbird_params_from_state_dict(torch_model.state_dict(), cfg)
    return cfg, params


def test_attention_type_fallback(jax_setup):
    cfg, _ = jax_setup
    # threshold = (5 + 2*2) * 16 = 144
    assert effective_attention_type(cfg, 144) == "original_full"
    assert effective_attention_type(cfg, 192) == "block_sparse"


def test_dense_fallback_parity(torch_model, jax_setup, rng):
    """Short sequence -> original_full on both sides.

    NOTE: HF's fallback permanently mutates the model instance
    (set_attention_type), so this test uses a fresh copy."""
    cfg, params = jax_setup
    tm = transformers.BigBirdModel(transformers.BigBirdConfig(**TINY))
    tm.load_state_dict(torch_model.state_dict())
    tm.eval()
    B, S = 2, 48
    ids = rng.integers(0, 99, (B, S))
    mask = np.ones((B, S), np.int64)
    mask[1, 30:] = 0
    with torch.no_grad():
        out = tm(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        )
    seq, pooled = bigbird_model(
        params, cfg,
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        precision="highest",
    )
    np.testing.assert_allclose(
        np.asarray(seq), out.last_hidden_state.numpy(), atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=3e-5, rtol=1e-3)


def test_block_sparse_parity_eval(torch_model, jax_setup, rng):
    """Long sequence -> block-sparse; eval mode = zero random blocks."""
    cfg, params = jax_setup
    B, S = 2, 192
    ids = rng.integers(0, 99, (B, S))
    mask = np.ones((B, S), np.int64)
    mask[1, 170:] = 0  # padding inside the last block
    with torch.no_grad():
        out = torch_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        )
    seq, pooled = bigbird_model(
        params, cfg,
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        precision="highest",
    )
    np.testing.assert_allclose(
        np.asarray(seq), out.last_hidden_state.numpy(), atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=5e-5, rtol=1e-3)


def test_inputs_embeds_block_sparse(torch_model, jax_setup, rng):
    """ProtSTonKGs-style usage: inputs_embeds, no token_type_ids."""
    cfg, params = jax_setup
    B, S, H = 2, 192, 64
    embeds = rng.normal(size=(B, S, H)).astype(np.float32)
    mask = np.ones((B, S), np.int64)
    with torch.no_grad():
        out = torch_model(
            inputs_embeds=torch.tensor(embeds),
            attention_mask=torch.tensor(mask),
        )
    seq, _ = bigbird_model(
        params, cfg,
        inputs_embeds=jnp.asarray(embeds), attention_mask=jnp.asarray(mask),
        precision="highest",
    )
    np.testing.assert_allclose(
        np.asarray(seq), out.last_hidden_state.numpy(), atol=5e-5, rtol=1e-3)


def test_block_sparse_training_mode_parity(torch_model, jax_setup, rng):
    """Train-mode forward (random plans active, dropout 0) matches HF."""
    cfg, params = jax_setup
    tm = transformers.BigBirdModel(transformers.BigBirdConfig(
        **{**TINY, "hidden_dropout_prob": 0.0,
           "attention_probs_dropout_prob": 0.0}))
    tm.load_state_dict(torch_model.state_dict())
    tm.train()  # random attention plans are generated (seeded per layer)
    B, S = 2, 192
    ids = rng.integers(0, 99, (B, S))
    mask = np.ones((B, S), np.int64)
    with torch.no_grad():
        out = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))

    from stonkgs_tpu.ops.bigbird_sparse import build_rand_attn

    rand_attn = build_rand_attn(
        S, cfg.block_size, cfg.num_random_blocks, cfg.num_attention_heads,
        cfg.num_hidden_layers, cfg.max_position_embeddings, training=True)
    seq, _ = bigbird_model(
        params, cfg,
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        precision="highest", rand_attn=rand_attn,
    )
    np.testing.assert_allclose(
        np.asarray(seq), out.last_hidden_state.numpy(), atol=5e-5, rtol=1e-3)


def test_training_rand_plan_matches_hf(torch_model):
    """Training-mode random plans replicate HF's np.random stream."""
    hf_attn = torch_model.encoder.layer[0].attention.self
    hf_attn.train()
    S, bs, r, H = 192, 16, 2, 4
    np.random.seed(0)  # HF seeds with the layer index before generating
    plan_len, plan_cnt = hf_attn._get_rand_attn_plan(S, bs, r)
    hf_plan = hf_attn._bigbird_block_rand_mask_with_head(
        from_seq_length=S, to_seq_length=S, from_block_size=bs,
        to_block_size=bs, num_heads=H,
        plan_from_length=plan_len, plan_num_rand_blocks=plan_cnt,
    )
    hf_plan = np.stack(hf_plan, 0)
    ours = build_rand_attn(S, bs, r, H, num_layers=1, max_seqlen=256,
                           training=True)[0]
    np.testing.assert_array_equal(ours, hf_plan)


def test_training_rand_plan_fixed_lengths(torch_model):
    """seq in {1024,3072,4096} uses the fixed-plan generator."""
    hf_attn = torch_model.encoder.layer[0].attention.self
    hf_attn.train()
    hf_attn.max_seqlen = 1024
    S, bs, r, H = 1024, 16, 2, 4
    np.random.seed(0)
    hf_plan = np.stack([
        hf_attn._bigbird_block_rand_mask(1024, 1024, bs, bs, r, last_idx=1024)
        [: S // bs - 2]
        for _ in range(H)
    ], 0)
    ours = build_rand_attn(S, bs, r, H, num_layers=1, max_seqlen=1024,
                           training=True)[0]
    np.testing.assert_array_equal(ours, hf_plan)
