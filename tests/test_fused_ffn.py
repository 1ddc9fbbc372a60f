"""Fused FFN Pallas kernel (dense -> erf-gelu -> dense) vs the XLA path.

Runs in interpreter mode on CPU.  Covers: forward parity in fp32 and
bf16, the in-kernel polynomial erf against jax.lax.erf, M-padding, and
the custom-VJP gradient path (backward recomputes the unfused forward).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stonkgs_tpu.ops.fused_ffn import _erf, _ffn_reference, fused_ffn


def _inputs(rng, M=24, H=32, I=64, dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((M, H)) * 0.5, dtype)
    w1 = jnp.asarray(rng.standard_normal((H, I)) * 0.1, dtype)
    b1 = jnp.asarray(rng.standard_normal((I,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((I, H)) * 0.1, dtype)
    b2 = jnp.asarray(rng.standard_normal((H,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def test_erf_poly_accuracy():
    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    got = _erf(x)
    ref = jax.lax.erf(x)
    # Abramowitz-Stegun 7.1.26: |error| < 1.5e-7 analytically; fp32
    # evaluation of the polynomial adds a few ulp on top
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("M", [16, 24])  # 24 exercises block padding (bm=16)
def test_forward_matches_reference_fp32(M):
    rng = np.random.default_rng(0)
    args = _inputs(rng, M=M)
    ref = _ffn_reference(*args)
    got = fused_ffn(*args, block_m=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_forward_bf16_and_3d_input():
    rng = np.random.default_rng(1)
    x, w1, b1, w2, b2 = _inputs(rng, M=32, dtype=jnp.bfloat16)
    x3 = x.reshape(2, 16, -1)
    ref = _ffn_reference(x3, w1, b1, w2, b2)
    got = fused_ffn(x3, w1, b1, w2, b2, block_m=16, interpret=True)
    assert got.shape == x3.shape and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_gelu_new_forward_and_grads():
    """tanh-form gelu (BigBird) matches the XLA reference in fwd and bwd."""
    rng = np.random.default_rng(3)
    args = _inputs(rng)
    ref = _ffn_reference(*args, act="gelu_new")
    got = fused_ffn(*args, act="gelu_new", block_m=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)
    w = jnp.asarray(rng.standard_normal(args[0].shape), jnp.float32)
    g_ref = jax.grad(lambda x: jnp.sum(
        _ffn_reference(x, *args[1:], act="gelu_new") * w))(args[0])
    g_got = jax.grad(lambda x: jnp.sum(
        fused_ffn(x, *args[1:], act="gelu_new", block_m=16,
                  interpret=True) * w))(args[0])
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=3e-6, rtol=1e-5)


def test_gradients_match_reference():
    rng = np.random.default_rng(2)
    args = _inputs(rng)
    w = jnp.asarray(rng.standard_normal(args[0].shape), jnp.float32)

    def loss(fn, *a):
        return jnp.sum(fn(*a) * w)

    ref = jax.grad(lambda *a: loss(_ffn_reference, *a),
                   argnums=tuple(range(5)))(*args)
    got = jax.grad(
        lambda *a: loss(
            lambda *b: fused_ffn(*b, block_m=16, interpret=True), *a),
        argnums=tuple(range(5)))(*args)
    for name, a, b in zip("x w1 b1 w2 b2".split(), got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-6, rtol=1e-5,
            err_msg=f"grad mismatch for {name}")


def _unfused_block(x, attn_out, g1, be1, w1, b1, w2, b2, g2, be2,
                   act="gelu", eps=1e-12):
    """The exact unfused chain the fused block replaces (bert.encoder_layer
    deterministic tail): LN1(x+attn) -> FFN -> LN2(res+ff)."""
    from stonkgs_tpu.models.bert import layer_norm

    x2 = layer_norm(x + attn_out.astype(x.dtype),
                    {"scale": g1, "bias": be1}, eps)
    ff = _ffn_reference(x2, w1, b1, w2, b2, act=act)
    return layer_norm(x2 + ff, {"scale": g2, "bias": be2}, eps)


@pytest.mark.parametrize("M,act", [(16, "gelu"), (24, "gelu_new")])
def test_fused_ffn_ln_block_matches_unfused(M, act):
    from stonkgs_tpu.ops.fused_ffn import fused_ffn_ln_block

    rng = np.random.default_rng(7)
    x, w1, b1, w2, b2 = _inputs(rng, M=M)
    H = x.shape[-1]
    attn = jnp.asarray(rng.standard_normal(x.shape) * 0.5, x.dtype)
    g1 = jnp.asarray(1.0 + 0.1 * rng.standard_normal(H), jnp.float32)
    be1 = jnp.asarray(0.1 * rng.standard_normal(H), jnp.float32)
    g2 = jnp.asarray(1.0 + 0.1 * rng.standard_normal(H), jnp.float32)
    be2 = jnp.asarray(0.1 * rng.standard_normal(H), jnp.float32)
    ref = _unfused_block(x, attn, g1, be1, w1, b1, w2, b2, g2, be2, act=act)
    got = fused_ffn_ln_block(x, attn, g1, be1, w1, b1, w2, b2, g2, be2,
                             act=act, block_m=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)


def test_fused_ffn_ln_block_bf16_3d():
    from stonkgs_tpu.ops.fused_ffn import fused_ffn_ln_block

    rng = np.random.default_rng(8)
    x, w1, b1, w2, b2 = _inputs(rng, M=32, dtype=jnp.bfloat16)
    H = x.shape[-1]
    x3 = x.reshape(2, 16, H)
    attn = jnp.asarray(rng.standard_normal(x3.shape) * 0.5, jnp.bfloat16)
    g1 = jnp.ones((H,), jnp.float32)
    be1 = jnp.zeros((H,), jnp.float32)
    g2 = jnp.asarray(1.0 + 0.1 * rng.standard_normal(H), jnp.float32)
    be2 = jnp.zeros((H,), jnp.float32)
    ref = _unfused_block(x3, attn, g1, be1, w1, b1, w2, b2, g2, be2)
    got = fused_ffn_ln_block(x3, attn, g1, be1, w1, b1, w2, b2, g2, be2,
                             block_m=16, interpret=True)
    assert got.shape == x3.shape and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2)


def test_fused_ffn_ln_block_gradients():
    """The fused block is differentiable: its custom VJP (which recomputes
    through the unfused chain) must match autodiff of the unfused chain in
    every argument — a deterministic forward under jax.grad (frozen-
    backbone ablations) must not error or silently diverge."""
    from stonkgs_tpu.ops.fused_ffn import fused_ffn_ln_block

    rng = np.random.default_rng(9)
    x, w1, b1, w2, b2 = _inputs(rng, M=16)
    H = x.shape[-1]
    attn = jnp.asarray(rng.standard_normal(x.shape) * 0.5, x.dtype)
    g1 = jnp.asarray(1.0 + 0.1 * rng.standard_normal(H), jnp.float32)
    be1 = jnp.asarray(0.1 * rng.standard_normal(H), jnp.float32)
    g2 = jnp.asarray(1.0 + 0.1 * rng.standard_normal(H), jnp.float32)
    be2 = jnp.asarray(0.1 * rng.standard_normal(H), jnp.float32)
    w = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    args = (x, attn, g1, be1, w1, b1, w2, b2, g2, be2)

    def loss_fused(*a):
        return jnp.sum(fused_ffn_ln_block(
            *a, block_m=16, interpret=True) * w)

    def loss_ref(*a):
        return jnp.sum(_unfused_block(*a) * w)

    got = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    ref = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    names = "x attn g1 be1 w1 b1 w2 b2 g2 be2".split()
    for name, a, b in zip(names, got, ref):
        assert a.dtype == b.dtype, name
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
            err_msg=f"grad mismatch for {name}")


def test_encoder_layer_routes_to_xla_on_cpu():
    """On CPU the encoder layer must use the unfused path (no Pallas)."""
    from stonkgs_tpu.config import BertConfig
    from stonkgs_tpu.models import bert

    cfg = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=32)
    params = bert.init_bert_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.arange(8, dtype=jnp.int32)[None, :]
    seq, pooled = bert.bert_model(params, cfg, input_ids=ids)
    assert np.isfinite(np.asarray(seq)).all()
    assert np.isfinite(np.asarray(pooled)).all()


# ---------------------------------------------------------------------------
# VMEM working-set gate (round-5: the round-4 all-heads flash kernel
# regression class — oversized shapes must FALL BACK, not fail Mosaic)
# ---------------------------------------------------------------------------

def test_vmem_gate_calibration_points():
    from stonkgs_tpu.ops.fused_ffn import ffn_kernel_fits

    # measured-good shapes on v5e must pass the gate
    assert ffn_kernel_fits(512, 768, 3072)            # BERT/BigBird base
    assert ffn_kernel_fits(512, 768, 3072, with_ln_block=True)
    assert ffn_kernel_fits(512, 1024, 4096)           # ProtBERT backbone
    # oversized hidden/intermediate must fail at any row block
    assert not ffn_kernel_fits(512, 2048, 8192)
    assert not ffn_kernel_fits(128, 2048, 8192)       # weights alone exceed


def test_vmem_gate_rejects_fp32_outright():
    """Round-5 regression: fp32 inputs blow Mosaic's ~16 MB scoped-VMEM
    limit at EVERY viable row block (measured on v5e: LN-block 768->3072
    fp32 fails with 20.73M at bm=512 and 16.25M at bm=256, vs the 16.00M
    limit; bf16 at the same shapes compiles).  The gate is categorical:
    itemsize > 2 never uses the fused kernels — fp32 numerics runs take
    the identical-math unfused chain via the _pick_block_m=None fallback."""
    from stonkgs_tpu.ops.fused_ffn import _pick_block_m, ffn_kernel_fits

    for bm in (512, 256, 128):
        assert not ffn_kernel_fits(bm, 768, 3072, itemsize=4,
                                   with_ln_block=True)
        assert not ffn_kernel_fits(bm, 768, 3072, itemsize=4)
    assert _pick_block_m(512, 16384, 768, 3072, itemsize=4,
                         with_ln_block=True) is None
    # the measured-good bf16 shape keeps its 512-row block
    assert _pick_block_m(512, 16384, 768, 3072, itemsize=2,
                         with_ln_block=True) == 512


def test_pick_block_m_honors_request_then_shrinks():
    from stonkgs_tpu.ops.fused_ffn import _pick_block_m

    # small explicit blocks (unit tests, serving) pass through untouched
    assert _pick_block_m(16, 24, 32, 64, itemsize=2,
                         with_ln_block=False) == 16
    # BERT-base shape keeps the requested 512 rows
    assert _pick_block_m(512, 65536, 768, 3072, itemsize=2,
                         with_ln_block=False) == 512
    # weights alone over budget: no block fits
    assert _pick_block_m(512, 65536, 2048, 8192, itemsize=2,
                         with_ln_block=False) is None
    # activation-bound case: shrinks the row block instead of giving up
    # (H=1024, I=8192: weights 32 MB; bm=512 needs ~+29 MB -> shrink)
    got = _pick_block_m(512, 65536, 1024, 8192, itemsize=2,
                        with_ln_block=False)
    assert got is not None and got < 512


def test_oversized_ffn_falls_back_not_compile(monkeypatch):
    """An over-VMEM config must run the unfused path, never the kernel.

    interpret=False so the Mosaic gate is consulted like on a real chip
    (interpret mode has no VMEM limits and honors any block)."""
    import stonkgs_tpu.ops.fused_ffn as ff

    def boom(*a, **k):
        raise AssertionError("Pallas kernel invoked past the VMEM gate")

    monkeypatch.setattr(ff, "_fused_ffn", boom)
    monkeypatch.setattr(ff, "_fused_block", boom)

    rng = np.random.default_rng(7)
    H, I, M = 2048, 8192, 8   # tiny M: the WEIGHTS blow the budget
    x = jnp.asarray(rng.standard_normal((M, H)) * 0.2, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((H, I)) * 0.02, jnp.float32)
    b1 = jnp.zeros((I,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((I, H)) * 0.02, jnp.float32)
    b2 = jnp.zeros((H,), jnp.float32)
    ref = ff._ffn_reference(x, w1, b1, w2, b2)
    got = ff.fused_ffn(x, w1, b1, w2, b2, interpret=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    g = jnp.ones((H,), jnp.float32)
    out = ff.fused_ffn_ln_block(x, x * 0.1, g, b2, w1, b1, w2, b2, g, b2,
                                interpret=False)
    refb = ff._block_ref_chain(x, x * 0.1, g, b2, w1, b1, w2, b2, g, b2,
                               act="gelu", eps=1e-12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(refb),
                               atol=1e-5, rtol=1e-5)


def test_in_budget_ffn_still_uses_kernel(monkeypatch):
    """The gate must not reroute shapes that fit (guard the fast path)."""
    import stonkgs_tpu.ops.fused_ffn as ff

    called = {}
    real = ff._fused_ffn

    def spy(*a):
        called["yes"] = True
        return real(*a)

    monkeypatch.setattr(ff, "_fused_ffn", spy)
    rng = np.random.default_rng(8)
    args = _inputs(rng, M=32)
    ff.fused_ffn(*args, block_m=16, interpret=True)
    assert called.get("yes")


# ---------------------------------------------------------------------------
# Fused backward kernel (recompute + 5 backward GEMMs in one Pallas call)
# ---------------------------------------------------------------------------

def _kernel_grads(args, w, act="gelu", block_m=16, monkeypatch=None):
    """Grads of sum(fused_ffn * w) with the backward FORCED onto the
    Pallas kernel (interpret mode — CPU tests)."""
    from stonkgs_tpu.ops import fused_ffn as ff

    monkeypatch.setattr(ff, "BWD_IMPL", "kernel")
    return jax.grad(
        lambda *a: jnp.sum(
            ff.fused_ffn(*a, act=act, block_m=block_m, interpret=True)
            .astype(jnp.float32) * w),
        argnums=tuple(range(5)))(*args)


def _reference_grads(args, w, act="gelu"):
    return jax.grad(
        lambda *a: jnp.sum(_ffn_reference(*a, act=act)
                           .astype(jnp.float32) * w),
        argnums=tuple(range(5)))(*args)


@pytest.mark.parametrize("M,act", [(16, "gelu"), (24, "gelu"),
                                   (24, "gelu_new")])
def test_bwd_kernel_grads_match_reference_fp32(M, act, monkeypatch):
    """All five grads vs the unfused-chain VJP; M=24 exercises the padded
    tail (zero rows must be exact no-ops for every dW/db accumulator)."""
    rng = np.random.default_rng(10)
    args = _inputs(rng, M=M)
    w = jnp.asarray(rng.standard_normal((M, args[0].shape[-1])), jnp.float32)
    got = _kernel_grads(args, w, act=act, monkeypatch=monkeypatch)
    ref = _reference_grads(args, w, act=act)
    for name, a, b in zip("x w1 b1 w2 b2".split(), got, ref):
        assert a.dtype == b.dtype, name
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6, rtol=2e-5,
            err_msg=f"bwd-kernel grad mismatch for {name}")


def test_bwd_kernel_grads_bf16(monkeypatch):
    """bf16 activations: kernel grads track the unfused bf16 chain (the
    kernel accumulates dW in fp32 where XLA rounds a single-GEMM output
    to bf16, so tolerances are bf16-scale)."""
    rng = np.random.default_rng(11)
    args = _inputs(rng, M=32, dtype=jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((32, args[0].shape[-1])), jnp.float32)
    got = _kernel_grads(args, w, monkeypatch=monkeypatch)
    ref = _reference_grads(args, w)
    for name, a, b in zip("x w1 b1 w2 b2".split(), got, ref):
        assert a.dtype == b.dtype, name
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-2, rtol=5e-2,
            err_msg=f"bwd-kernel bf16 grad mismatch for {name}")


def test_bwd_kernel_multi_block_accumulation(monkeypatch):
    """dW/db must accumulate across grid steps: run 4 row blocks and check
    against the single-block answer."""
    rng = np.random.default_rng(12)
    args = _inputs(rng, M=64)
    w = jnp.asarray(rng.standard_normal((64, args[0].shape[-1])), jnp.float32)
    multi = _kernel_grads(args, w, block_m=16, monkeypatch=monkeypatch)
    single = _kernel_grads(args, w, block_m=64, monkeypatch=monkeypatch)
    for name, a, b in zip("x w1 b1 w2 b2".split(), multi, single):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6, rtol=2e-5,
            err_msg=f"block-accumulation mismatch for {name}")


def test_bwd_gate_calibration_points():
    from stonkgs_tpu.ops.fused_ffn import (_pick_bwd_block_m,
                                           ffn_bwd_kernel_fits)

    # BERT-base training shape: bm=256's 4-deep pipelined dh/a blocks
    # alone exceed the 16 MB scoped limit; bm=128 compiles on hardware
    # (and is the measured +7.3% step) — the picker must land on 128
    assert not ffn_bwd_kernel_fits(256, 768, 3072)
    assert ffn_bwd_kernel_fits(128, 768, 3072)
    assert _pick_bwd_block_m(16384, 768, 3072, itemsize=2) == 128
    # ProtBERT-shape FFN (1024->4096): the (bm, I) chains + pipelined
    # blocks exceed scoped VMEM at every row block >= 128 — that model
    # keeps the XLA recompute chain
    assert _pick_bwd_block_m(16384, 1024, 4096, itemsize=2) is None
    # fp32 is categorically rejected (bf16-path optimization)
    assert _pick_bwd_block_m(16384, 768, 3072, itemsize=4) is None
    # oversized weights never fit
    assert _pick_bwd_block_m(16384, 2048, 8192, itemsize=2) is None


def test_bwd_auto_stays_on_xla_under_interpret():
    """On CPU (interpret) the auto backward must keep the XLA recompute
    chain — bit-identical to the pre-kernel behavior."""
    rng = np.random.default_rng(13)
    args = _inputs(rng, M=16)
    w = jnp.asarray(rng.standard_normal((16, args[0].shape[-1])), jnp.float32)
    got = jax.grad(
        lambda *a: jnp.sum(
            fused_ffn(*a, block_m=16, interpret=True) * w),
        argnums=tuple(range(5)))(*args)
    ref = _reference_grads(args, w)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
