"""Int8 weight quantization: structure, dispatch, and output fidelity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.ops.quantization import dense_int8, quantize_kernel, quantize_params

CFG = STonKGsConfig(
    bert=BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=128,
                    max_position_embeddings=64),
    kg_vocab_size=150, text_len=16, entity_len=16)


def test_quantize_kernel_2d_and_3d(rng):
    k2 = rng.normal(size=(64, 96)).astype(np.float32)
    q = quantize_kernel(k2)
    assert q["kernel_q"].dtype == jnp.int8
    assert q["scale"].shape == (96,)
    deq = np.asarray(q["kernel_q"], np.float32) * np.asarray(q["scale"])
    assert np.abs(deq - k2).max() < np.abs(k2).max() / 100

    k3 = rng.normal(size=(2, 64, 96)).astype(np.float32)
    q3 = quantize_kernel(k3)
    assert q3["scale"].shape == (2, 96)


def test_dense_int8_accuracy(rng):
    x = jnp.asarray(rng.normal(size=(8, 64)), jnp.float32)
    kernel = rng.normal(size=(64, 96)).astype(np.float32)
    bias = rng.normal(size=96).astype(np.float32)
    ref = np.asarray(x) @ kernel + bias
    q = quantize_kernel(kernel)
    q["bias"] = jnp.asarray(bias)
    out = np.asarray(dense_int8(x, q))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel


def test_quantized_model_outputs_close():
    params = stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), CFG)
    params["kg_backbone"] = jax.random.normal(
        jax.random.PRNGKey(1), (CFG.kg_table_size, 64)) * 0.1
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(np.concatenate(
            [rng.integers(0, 128, (4, 16)), rng.integers(0, 150, (4, 16))], 1)),
        "attention_mask": jnp.ones((4, 32), jnp.int32),
        "token_type_ids": jnp.asarray(np.concatenate(
            [np.zeros((4, 16), np.int32), np.ones((4, 16), np.int32)], 1)),
    }
    ref = np.asarray(stonkgs.pooler_output(params, CFG, batch))
    pq = quantize_params(params)
    # encoder + heads quantized; pooler and embeddings untouched
    assert "kernel_q" in pq["trunk"]["encoder"]["attention"]["query"]
    assert "kernel_q" in pq["cls"]["predictions"]["entity_decoder"]
    assert "kernel" in pq["trunk"]["pooler"]
    assert pq["trunk"]["embeddings"]["word_embeddings"].dtype != jnp.int8

    out = np.asarray(stonkgs.pooler_output(pq, CFG, batch))
    cos = np.sum(ref * out, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1))
    assert (cos > 0.98).all(), cos
