"""Differentiable flash attention (Pallas custom VJP) vs the XLA path.

Runs in interpreter mode on CPU.  Covers: forward parity, gradient parity
for q/k/v/bias (the backward Pallas kernel recomputes probabilities from
the saved logsumexp), sequence padding, dropout mask determinism between
forward and backward (finite-difference check), and bf16 inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stonkgs_tpu.ops.attention import dot_product_attention
from stonkgs_tpu.ops.flash_attention import flash_attention_train


def _qkv(rng, B=2, S=48, H=3, D=16, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), dtype)
    mask = (rng.random((B, S)) > 0.2).astype(np.float32)
    mask[:, :4] = 1.0  # at least some attendable keys per row
    bias = jnp.asarray((1.0 - mask) * -1e9, jnp.float32)[:, None, None, :]
    return q, k, v, bias


@pytest.mark.parametrize("S", [48, 64])  # 48 exercises the padding path
def test_forward_matches_xla(S):
    rng = np.random.default_rng(0)
    q, k, v, bias = _qkv(rng, S=S)
    ref = dot_product_attention(q, k, v, bias, impl="xla")
    got = flash_attention_train(q, k, v, bias, block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_gradients_match_xla():
    rng = np.random.default_rng(1)
    q, k, v, bias = _qkv(rng)
    w = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss(fn, q, k, v, bias):
        return jnp.sum(fn(q, k, v, bias) * w)

    ref = jax.grad(
        lambda *a: loss(lambda q, k, v, b: dot_product_attention(
            q, k, v, b, impl="xla"), *a),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    got = jax.grad(
        lambda *a: loss(lambda q, k, v, b: flash_attention_train(
            q, k, v, b, block_q=32, interpret=True), *a),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkv bias".split(), got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4,
            err_msg=f"grad mismatch for {name}")


def test_gradients_no_bias():
    rng = np.random.default_rng(2)
    q, k, v, _ = _qkv(rng)

    def loss(q, k, v):
        return jnp.sum(flash_attention_train(
            q, k, v, None, block_q=32, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, None, impl="xla") ** 2)

    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4)


def test_dropout_deterministic_per_seed():
    rng = np.random.default_rng(3)
    q, k, v, bias = _qkv(rng)
    key = jax.random.PRNGKey(7)
    out1 = flash_attention_train(q, k, v, bias, dropout_rate=0.25,
                                 dropout_rng=key, block_q=32, interpret=True)
    out2 = flash_attention_train(q, k, v, bias, dropout_rate=0.25,
                                 dropout_rng=key, block_q=32, interpret=True)
    out3 = flash_attention_train(q, k, v, bias, dropout_rate=0.25,
                                 dropout_rng=jax.random.PRNGKey(8),
                                 block_q=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # dropout actually drops: different from the deterministic output
    base = flash_attention_train(q, k, v, bias, block_q=32, interpret=True)
    assert not np.allclose(np.asarray(out1), np.asarray(base))


def test_dropout_gradients_consistent():
    """The backward kernel must regenerate the same mask as the forward
    (finite differences hold because the mask depends only on the seed)."""
    rng = np.random.default_rng(4)
    q, k, v, bias = _qkv(rng, B=1, S=32, H=2, D=8)
    key = jax.random.PRNGKey(11)

    def f(q, k, v):
        return flash_attention_train(
            q, k, v, bias, dropout_rate=0.3, dropout_rng=key,
            block_q=32, interpret=True)

    # manual directional finite-difference check: the dropout mask depends
    # only on the seed, so f is smooth in (q, k, v) and FD must agree with
    # the custom VJP
    rng = np.random.default_rng(17)
    w = jnp.asarray(rng.standard_normal(f(q, k, v).shape), jnp.float32)

    def scalar(q, k, v):
        return jnp.sum(f(q, k, v) * w)

    grads = jax.grad(scalar, argnums=(0, 1, 2))(q, k, v)
    eps = 1e-3
    for i, (x, g) in enumerate(zip((q, k, v), grads)):
        d = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        args_p = [q, k, v]
        args_m = [q, k, v]
        args_p[i] = x + eps * d
        args_m[i] = x - eps * d
        fd = (float(scalar(*args_p)) - float(scalar(*args_m))) / (2 * eps)
        analytic = float(jnp.sum(g * d))
        np.testing.assert_allclose(analytic, fd, atol=5e-2, rtol=5e-2,
                                   err_msg=f"arg {i} ({'qkv'[i]})")


def test_bf16_inputs():
    rng = np.random.default_rng(5)
    q, k, v, bias = _qkv(rng, dtype=jnp.bfloat16)
    ref = dot_product_attention(q, k, v, bias, impl="xla")

    def loss(q, k, v):
        return jnp.sum(flash_attention_train(
            q, k, v, bias, block_q=32, interpret=True).astype(jnp.float32))

    out = flash_attention_train(q, k, v, bias, block_q=32, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)
    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert all(g.dtype == jnp.bfloat16 for g in grads)
    assert all(np.isfinite(np.asarray(g, np.float32)).all() for g in grads)


def test_pretraining_grads_match_xla_attention():
    """Full STonKGs pretraining loss: flash-VJP attention == XLA attention
    (values and gradients, deterministic, interpret mode)."""
    from stonkgs_tpu.config import BertConfig, STonKGsConfig
    from stonkgs_tpu.models import stonkgs
    from stonkgs_tpu.utils.init import fast_init

    cfg = STonKGsConfig(
        bert=BertConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=32),
        kg_vocab_size=111, text_len=16, entity_len=16,
    )
    params = fast_init(
        lambda: stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    B = 2
    text = rng.integers(0, cfg.bert.vocab_size, (B, cfg.text_len))
    ent = rng.integers(0, cfg.kg_vocab_size, (B, cfg.entity_len))
    mlm = np.full((B, cfg.text_len), -100, np.int64)
    elm = np.full((B, cfg.entity_len), -100, np.int64)
    mlm[:, 1:3] = rng.integers(0, cfg.bert.vocab_size, (B, 2))
    elm[:, 2:4] = rng.integers(0, cfg.kg_vocab_size, (B, 2))
    batch = {
        "input_ids": jnp.asarray(np.concatenate([text, ent], 1)),
        "attention_mask": jnp.ones((B, cfg.seq_len), jnp.int32),
        "token_type_ids": jnp.asarray(np.concatenate(
            [np.zeros((B, cfg.text_len), np.int64),
             np.ones((B, cfg.entity_len), np.int64)], 1)),
        "masked_lm_labels": jnp.asarray(mlm),
        "ent_masked_lm_labels": jnp.asarray(elm),
        "next_sentence_labels": jnp.asarray(rng.integers(0, 2, (B,))),
    }

    def loss(params, impl):
        l, _ = stonkgs.pretraining_loss(
            params, cfg, batch, deterministic=True, attention_impl=impl)
        return l

    l0, g0 = jax.value_and_grad(loss)(params, "xla")
    l1, g1 = jax.value_and_grad(loss)(params, "flash")
    assert abs(float(l0) - float(l1)) < 1e-4
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_sharded_dropout_decorrelates_across_shards():
    """Under impl=("flash", mesh) the dropout seed folds in the shard
    index: identical examples placed on different data shards must get
    DIFFERENT masks (without folding they would be identical, silently
    correlating regularization across the fleet)."""
    from stonkgs_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=1)
    rng = np.random.default_rng(0)
    S, H, D = 32, 2, 8
    one = rng.standard_normal((1, S, H, D)).astype(np.float32)
    # the same example repeated across all shards
    q = jnp.asarray(np.repeat(one, 8, axis=0))
    k = jnp.asarray(np.repeat(rng.standard_normal((1, S, H, D)), 8, 0).astype(np.float32))
    v = jnp.asarray(np.repeat(rng.standard_normal((1, S, H, D)), 8, 0).astype(np.float32))
    key = jax.random.PRNGKey(5)
    out = dot_product_attention(
        q, k, v, None, dropout_rate=0.5, dropout_rng=key,
        deterministic=False, impl=("flash", mesh))
    out = np.asarray(out)
    # rows 0-1 live on shard 0, rows 2-3 on shard 1: same inputs, same
    # base key, different shard -> different dropout mask
    assert not np.allclose(out[0], out[2])
    # within one shard the per-row mask still differs (row offset)
    assert not np.allclose(out[0], out[1])
    assert np.isfinite(out).all()


def test_dot_product_attention_training_routes_to_kernel():
    """impl='flash' + deterministic=False must apply in-kernel dropout."""
    rng = np.random.default_rng(6)
    q, k, v, bias = _qkv(rng)
    key = jax.random.PRNGKey(0)
    out = dot_product_attention(
        q, k, v, bias, dropout_rate=0.5, dropout_rng=key,
        deterministic=False, impl="flash")
    base = dot_product_attention(q, k, v, bias, impl="flash")
    assert not np.allclose(np.asarray(out), np.asarray(base))


# ---------------------------------------------------------------------------
# inference kernel (bf16 MXU compute, custom VJP delegating to train kernels)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("S", [48, 64])
def test_infer_forward_matches_xla(S):
    from stonkgs_tpu.ops.flash_attention import flash_attention_infer

    rng = np.random.default_rng(7)
    q, k, v, bias = _qkv(rng, S=S)
    ref = dot_product_attention(q, k, v, bias, impl="xla")
    got = flash_attention_infer(q, k, v, bias, block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_infer_no_bias_and_bf16():
    from stonkgs_tpu.ops.flash_attention import flash_attention_infer

    rng = np.random.default_rng(8)
    q, k, v, _ = _qkv(rng, dtype=jnp.bfloat16)
    ref = dot_product_attention(q, k, v, None, impl="xla")
    got = flash_attention_infer(q, k, v, None, block_q=32, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_infer_gradients_match_xla():
    """The custom VJP routes backward through the train kernels."""
    from stonkgs_tpu.ops.flash_attention import flash_attention_infer

    rng = np.random.default_rng(9)
    q, k, v, bias = _qkv(rng)
    w = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss(fn, q, k, v, bias):
        return jnp.sum(fn(q, k, v, bias) * w)

    ref = jax.grad(
        lambda *a: loss(lambda q, k, v, b: dot_product_attention(
            q, k, v, b, impl="xla"), *a),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    got = jax.grad(
        lambda *a: loss(lambda q, k, v, b: flash_attention_infer(
            q, k, v, b, block_q=32, interpret=True), *a),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("q k v bias".split(), got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4,
            err_msg=f"grad mismatch for {name}")


def test_auto_impl_resolution():
    from stonkgs_tpu.ops.attention import resolve_infer_impl

    # on CPU "auto" must always resolve to xla
    assert resolve_infer_impl("auto", 512) == "xla"
    assert resolve_infer_impl("auto", 256) == "xla"
    assert resolve_infer_impl("flash", 512) == "flash"


def test_infer_kernel_vmem_gate():
    """The all-heads inference kernel must be rejected at shapes whose
    per-program VMEM working set exceeds the 16 MB scoped limit.

    Round-4 regression: the S>=384 auto-selection routed the ProtBERT
    backbone (H=16, S=3072) to the all-heads kernel, whose ~56 MB k/v
    blocks fail Mosaic compilation on a real chip (interpret-mode CPU
    tests cannot catch this)."""
    from stonkgs_tpu.ops.flash_attention import infer_kernel_fits

    # STonKGs trunk: 12 heads, 512 tokens, D=64 -> ~14.6 MB, fits
    assert infer_kernel_fits(512, 12, 64)
    # bucketed trunk shape (text bucket 128 + 256 entities)
    assert infer_kernel_fits(384, 12, 64)
    # ProtBERT backbone: 16 heads, 3072 tokens -> ~75 MB, must NOT fit
    assert not infer_kernel_fits(3072, 16, 64)
    # BigBird-size full attention (12 heads, 4096) also must not fit
    assert not infer_kernel_fits(4096, 12, 64)


def test_infer_kernel_vmem_gate_fp32_stack_points():
    """Round-5 regression: Mosaic multi-buffers the pipelined blocks 4-deep
    at realistic grids, so fp32 compute blows the 16 MB scoped limit at
    trunk shapes that pass at bf16 (measured on v5e: fp32 H=12 S=512
    bq=512 fails with a 24.00M scoped allocation = exactly 4x its block
    bytes; S=384 and bq=256 fail too; bq=128 compiles)."""
    from stonkgs_tpu.ops.flash_attention import infer_kernel_fits

    assert not infer_kernel_fits(512, 12, 64, itemsize=4)
    assert not infer_kernel_fits(512, 12, 64, block_q=256, itemsize=4)
    assert not infer_kernel_fits(384, 12, 64, itemsize=4)
    assert infer_kernel_fits(512, 12, 64, block_q=128, itemsize=4)


def test_deterministic_flash_falls_back_past_vmem_gate(monkeypatch):
    """dot_product_attention(impl='flash', deterministic=True) must still
    produce correct output at shapes where the all-heads inference kernel
    does not fit (it silently falls back to the per-head train kernel)."""
    import stonkgs_tpu.ops.flash_attention as fa

    rng = np.random.default_rng(11)
    q, k, v, bias = _qkv(rng, S=64)
    ref = dot_product_attention(q, k, v, bias, impl="xla")

    # force the gate shut: the flash path must route through the per-head
    # train kernel (rate 0, rng None) and still match XLA
    monkeypatch.setattr(fa, "infer_kernel_fits", lambda *a, **kw: False)
    out = dot_product_attention(
        q, k, v, bias, deterministic=True, impl="flash")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
