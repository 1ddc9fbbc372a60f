"""Numerical parity of the JAX BERT encoder vs HuggingFace torch BertModel.

The reference trunk/backbone are HF ``BertModel`` (``stonkgs_model.py:107,
204-210``); these tests pin our encoder to the exact same numerics with
randomly initialized weights (no network access needed).
"""

import numpy as np
import pytest
import torch
import transformers

import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig
from stonkgs_tpu.models import bert
from stonkgs_tpu.utils.hf_loader import bert_params_from_state_dict

TINY = dict(
    vocab_size=99,
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=96,
    type_vocab_size=2,
)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(**TINY)
    model = transformers.BertModel(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_setup(torch_model):
    cfg = BertConfig(**TINY)
    params = bert_params_from_state_dict(torch_model.state_dict(), cfg)
    return cfg, params


def _rand_batch(rng, B=3, S=48, vocab=99):
    ids = rng.integers(0, vocab, (B, S))
    mask = np.ones((B, S), np.int64)
    mask[0, 40:] = 0  # padding on one row
    mask[2, 10:] = 0
    tti = np.zeros((B, S), np.int64)
    tti[:, S // 2:] = 1
    return ids, mask, tti


def test_bert_model_parity_input_ids(torch_model, jax_setup, rng):
    cfg, params = jax_setup
    ids, mask, tti = _rand_batch(rng)
    with torch.no_grad():
        out = torch_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tti),
        )
    seq, pooled = bert.bert_model(
        params, cfg,
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        token_type_ids=jnp.asarray(tti),
        precision="highest",
    )
    np.testing.assert_allclose(
        np.asarray(seq), out.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5, rtol=1e-4
    )


def test_bert_model_parity_fp64_exact(torch_model, jax_setup, rng):
    """Formula-level equivalence: in fp64 both implementations agree to ~1e-12."""
    import jax

    cfg, params = jax_setup
    ids, mask, tti = _rand_batch(rng)
    tm = transformers.BertModel(transformers.BertConfig(**TINY)).double()
    tm.load_state_dict(torch_model.state_dict())
    tm.eval()
    with torch.no_grad():
        out = tm(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tti),
        )
    with jax.enable_x64(True):
        params64 = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            params,
        )
        seq, pooled = bert.bert_model(
            params64, cfg,
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            token_type_ids=jnp.asarray(tti),
            compute_dtype=jnp.float64,
            precision="highest",
        )
        np.testing.assert_allclose(
            np.asarray(seq), out.last_hidden_state.numpy(), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(pooled), out.pooler_output.numpy(), atol=1e-10
        )


def test_bert_model_parity_inputs_embeds(torch_model, jax_setup, rng):
    """Trunk-style usage: inputs_embeds + token_type_ids (stonkgs_model.py:204-210)."""
    cfg, params = jax_setup
    B, S, H = 2, 32, TINY["hidden_size"]
    embeds = rng.normal(size=(B, S, H)).astype(np.float32)
    mask = np.ones((B, S), np.int64)
    mask[1, 20:] = 0
    tti = np.zeros((B, S), np.int64)
    tti[:, 16:] = 1
    with torch.no_grad():
        out = torch_model(
            inputs_embeds=torch.tensor(embeds),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tti),
        )
    seq, pooled = bert.bert_model(
        params, cfg,
        inputs_embeds=jnp.asarray(embeds),
        attention_mask=jnp.asarray(mask),
        token_type_ids=jnp.asarray(tti),
        precision="highest",
    )
    np.testing.assert_allclose(
        np.asarray(seq), out.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5, rtol=1e-4
    )


def test_bert_no_attention_mask(torch_model, jax_setup, rng):
    """Backbone-style usage: no attention mask at all (stonkgs_model.py:178)."""
    cfg, params = jax_setup
    ids = rng.integers(0, TINY["vocab_size"], (2, 24))
    with torch.no_grad():
        out = torch_model(input_ids=torch.tensor(ids))
    seq, _ = bert.bert_model(
        params, cfg, input_ids=jnp.asarray(ids), precision="highest"
    )
    np.testing.assert_allclose(
        np.asarray(seq), out.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )


def test_flash_attention_matches_xla(rng):
    from stonkgs_tpu.ops.attention import _xla_attention
    from stonkgs_tpu.ops.flash_attention import flash_attention

    B, S, H, D = 2, 130, 4, 64  # non-multiple of block to exercise padding
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    mask = np.ones((B, S), np.float32)
    mask[1, 100:] = 0.0
    bias = jnp.asarray((1.0 - mask) * -1e9)[:, None, None, :]

    ref = _xla_attention(q, k, v, bias, dropout_rate=0.0, dropout_rng=None,
                         deterministic=True, precision="highest")
    out = flash_attention(q, k, v, bias=bias, block_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
