"""Functional BERT encoder in pure JAX.

Semantics match HuggingFace ``BertModel`` exactly (post-LayerNorm, erf-gelu,
LayerNorm eps 1e-12, tanh pooler on the first token) so that the
``stonkgs/stonkgs-150k`` / ``-300k`` checkpoints reproduce the reference
outputs (reference trunk usage: ``/root/reference/src/stonkgs/models/
stonkgs_model.py:204-212``).

Design notes (TPU-first):
  * Parameters live in a pytree of plain ``jnp`` arrays.  The per-layer
    parameters are **stacked along a leading layer axis** and the encoder
    iterates with ``jax.lax.scan`` — one trace/compile of a single layer
    regardless of depth, and a layout that pjit shards cleanly.
  * All matmuls take a ``precision`` argument: ``None`` (fast, bf16 MXU
    passes) for production, ``"highest"`` for <1e-5 parity with the fp32
    PyTorch reference.
  * Dropout is functional: pass ``dropout_rng`` and ``deterministic=False``
    during training.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig
from stonkgs_tpu.ops.attention import dot_product_attention

Array = jax.Array

NEG_INF = -1e9  # additive attention bias for masked positions


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def dense(x: Array, p: dict, precision=None) -> Array:
    """y = x @ kernel + bias.  kernel: (in, out).

    Dispatches to the int8 path when the leaf was quantized
    (``ops.quantization.quantize_params``)."""
    if "kernel_q" in p:
        from stonkgs_tpu.ops.quantization import dense_int8

        return dense_int8(x, p, precision)
    y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype), precision=precision)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm(x: Array, scale: Array, bias: Array, eps: float) -> Array:
    f = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(f)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(f) + bias.astype(f)
    return y.astype(x.dtype)


def _layer_norm_fwd(x, scale, bias, eps):
    f = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(f)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd * scale.astype(f) + bias.astype(f)
    # Residuals: x in its ORIGINAL dtype + the (.., 1) statistics. Plain
    # autodiff keeps several fp32 copies of the residual stream alive per
    # LayerNorm (measured: 6 x f32[L,B,S,H] HLO temps in the train step),
    # which dominated training HBM under selective remat.
    return y.astype(x.dtype), (x, scale, mean, rstd)


def _layer_norm_bwd(eps, res, g):
    x, scale, mean, rstd = res
    f = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(f)
    gf = g.astype(f)
    xhat = (xf - mean) * rstd
    dbias = jnp.sum(gf, axis=tuple(range(g.ndim - 1)))
    dscale = jnp.sum(gf * xhat, axis=tuple(range(g.ndim - 1)))
    gs = gf * scale.astype(f)
    dx = rstd * (
        gs
        - jnp.mean(gs, axis=-1, keepdims=True)
        - xhat * jnp.mean(gs * xhat, axis=-1, keepdims=True)
    )
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


_layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)


def layer_norm(x: Array, p: dict, eps: float) -> Array:
    """LayerNorm over the last axis; statistics in >= fp32 for stability.

    Custom VJP: the backward pass recomputes x_hat from compact residuals
    instead of letting autodiff save fp32 intermediates of the full
    residual stream."""
    return _layer_norm(x, p["scale"], p["bias"], eps)


def activation(name: str):
    """Resolve an HF activation name to its JAX function."""
    if name == "gelu":
        return partial(jax.nn.gelu, approximate=False)
    if name in ("gelu_new", "gelu_pytorch_tanh"):
        return partial(jax.nn.gelu, approximate=True)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unsupported activation: {name}")


def dropout(x: Array, rate: float, rng: Optional[Array], deterministic: bool) -> Array:
    """Inverted dropout; identity when deterministic or rng is None."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# parameter initialization
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, std):
    # HF uses torch.nn.init.normal_(std=initializer_range) via _init_weights
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def _init_dense(key, d_in, d_out, std):
    kk, _ = jax.random.split(key)
    return {
        "kernel": _trunc_normal(kk, (d_in, d_out), std),
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _init_layer_norm(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_embedding_params(key: Array, cfg: BertConfig) -> dict:
    """Word/position/token-type embedding tables + LayerNorm params."""
    k1, k2, k3 = jax.random.split(key, 3)
    h = cfg.hidden_size
    return {
        "word_embeddings": _trunc_normal(k1, (cfg.vocab_size, h), cfg.initializer_range),
        "position_embeddings": _trunc_normal(
            k2, (cfg.max_position_embeddings, h), cfg.initializer_range
        ),
        "token_type_embeddings": _trunc_normal(
            k3, (cfg.type_vocab_size, h), cfg.initializer_range
        ),
        "layer_norm": _init_layer_norm(h),
    }


def init_layer_params(key: Array, cfg: BertConfig) -> dict:
    """One encoder layer (pre-stacking)."""
    ks = jax.random.split(key, 6)
    h, i = cfg.hidden_size, cfg.intermediate_size
    std = cfg.initializer_range
    return {
        "attention": {
            "query": _init_dense(ks[0], h, h, std),
            "key": _init_dense(ks[1], h, h, std),
            "value": _init_dense(ks[2], h, h, std),
            "output": _init_dense(ks[3], h, h, std),
            "output_layer_norm": _init_layer_norm(h),
        },
        "intermediate": _init_dense(ks[4], h, i, std),
        "output": _init_dense(ks[5], i, h, std),
        "output_layer_norm": _init_layer_norm(h),
    }


def init_bert_params(key: Array, cfg: BertConfig, with_pooler: bool = True) -> dict:
    """Initialize a full BertModel parameter tree (layers stacked on axis 0)."""
    k_emb, k_layers, k_pool = jax.random.split(key, 3)
    layer_keys = jax.random.split(k_layers, cfg.num_hidden_layers)
    layers = [init_layer_params(k, cfg) for k in layer_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)
    params = {"embeddings": init_embedding_params(k_emb, cfg), "encoder": stacked}
    if with_pooler:
        params["pooler"] = _init_dense(k_pool, cfg.hidden_size, cfg.hidden_size,
                                       cfg.initializer_range)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def embed(
    params: dict,
    cfg: BertConfig,
    input_ids: Optional[Array] = None,
    inputs_embeds: Optional[Array] = None,
    token_type_ids: Optional[Array] = None,
    position_ids: Optional[Array] = None,
    *,
    deterministic: bool = True,
    dropout_rng: Optional[Array] = None,
    compute_dtype=jnp.float32,
) -> Array:
    """BertEmbeddings: word/inputs + position + token-type, LayerNorm, dropout.

    When ``inputs_embeds`` is given, position and token-type embeddings are
    still added — this is how the STonKGs trunk consumes backbone embeddings
    (reference: ``stonkgs_model.py:204-210`` via HF BertEmbeddings).
    """
    p = params["embeddings"]
    if inputs_embeds is None:
        inputs_embeds = jnp.take(p["word_embeddings"], input_ids, axis=0)
    inputs_embeds = inputs_embeds.astype(compute_dtype)
    seq_len = inputs_embeds.shape[-2]
    if position_ids is None:
        position_ids = jnp.arange(seq_len)[None, :]
    if token_type_ids is None:
        token_type_ids = jnp.zeros(inputs_embeds.shape[:-1], jnp.int32)
    pos = jnp.take(p["position_embeddings"], position_ids, axis=0).astype(compute_dtype)
    tok = jnp.take(p["token_type_embeddings"], token_type_ids, axis=0).astype(compute_dtype)
    x = inputs_embeds + pos + tok
    x = layer_norm(x, p["layer_norm"], cfg.layer_norm_eps)
    return dropout(x, cfg.hidden_dropout_prob, dropout_rng, deterministic)


def attention_bias_from_mask(attention_mask: Optional[Array], dtype=jnp.float32) -> Optional[Array]:
    """(B, S) 1/0 mask -> (B, 1, 1, S) additive bias (0 keep, -1e9 drop)."""
    if attention_mask is None:
        return None
    bias = (1.0 - attention_mask.astype(dtype)) * NEG_INF
    return bias[:, None, None, :]


def encoder_layer(
    x: Array,
    lp: dict,
    cfg: BertConfig,
    attn_bias: Optional[Array],
    *,
    deterministic: bool = True,
    dropout_rng: Optional[Array] = None,
    precision=None,
    attention_impl: str = "xla",
    remat_attention: bool = False,
) -> Array:
    """One post-LN BERT layer: self-attention + FFN, residuals, LayerNorms.

    ``remat_attention`` checkpoints only the attention sub-block: the
    O(B*heads*S^2) score/softmax buffers — the dominant backward-pass HBM
    cost at seq 512 — are recomputed, while the cheap-to-store FFN
    activations are saved (selective remat, cheaper than full-layer remat).
    """
    B, S, H = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    ap = lp["attention"]
    if not deterministic and dropout_rng is not None:
        r_attn, r_ao, r_ff = jax.random.split(dropout_rng, 3)
    else:
        r_attn = r_ao = r_ff = None

    def attn_block(x, ap):
        # NOTE: fusing Q/K/V into one (H, 3H) GEMM was measured SLOWER in
        # the full model (218 vs 196 ms extraction batch) despite the wider
        # GEMM winning in isolation (~195 vs ~125 TFLOP/s): the per-layer
        # kernel concat + logits split defeats XLA fusion around the scan.
        q = dense(x, ap["query"], precision).reshape(B, S, nh, hd)
        k = dense(x, ap["key"], precision).reshape(B, S, nh, hd)
        v = dense(x, ap["value"], precision).reshape(B, S, nh, hd)
        ctx = dot_product_attention(
            q, k, v, bias=attn_bias,
            dropout_rate=cfg.attention_probs_dropout_prob,
            dropout_rng=r_attn, deterministic=deterministic,
            precision=precision, impl=attention_impl,
        )
        return dense(ctx.reshape(B, S, H), ap["output"], precision)

    if remat_attention:
        attn_block = jax.checkpoint(attn_block)
    attn_out = attn_block(x, ap)

    fusable_ffn = (
        precision is None
        and cfg.hidden_act in ("gelu", "gelu_new")
        and "kernel" in lp["intermediate"]
        and "kernel" in lp["output"]
        and jax.default_backend() == "tpu"
    )
    if deterministic and fusable_ffn:
        # Inference: the whole post-attention half of the layer —
        # LN(x+attn) -> FFN -> LN(res+ff) — runs as ONE Pallas kernel
        # (dropouts are no-ops when deterministic, so nothing sits between
        # the fused stages). Kills both LayerNorm HBM passes and the
        # intermediate residual round trip (~500 MB/layer at M=65536).
        from stonkgs_tpu.ops.fused_ffn import fused_ffn_ln_block

        return fused_ffn_ln_block(
            x, attn_out,
            ap["output_layer_norm"]["scale"], ap["output_layer_norm"]["bias"],
            lp["intermediate"]["kernel"], lp["intermediate"]["bias"],
            lp["output"]["kernel"], lp["output"]["bias"],
            lp["output_layer_norm"]["scale"], lp["output_layer_norm"]["bias"],
            act=cfg.hidden_act, eps=cfg.layer_norm_eps,
        )

    attn_out = dropout(attn_out, cfg.hidden_dropout_prob, r_ao, deterministic)
    x = layer_norm(x + attn_out, ap["output_layer_norm"], cfg.layer_norm_eps)

    if fusable_ffn:
        # Pallas fused dense->gelu->dense keeps the (M, intermediate)
        # activation in VMEM — measured 3.74 vs 5.35 ms per trunk FFN pair
        # on v5e (ops/fused_ffn.py).  In training its custom VJP
        # recomputes the intermediates, so the bf16[L, B, S, 4H] buffers
        # that dominated attention-remat HBM (9.2 GB at TransE B=128)
        # never exist in either direction.
        from stonkgs_tpu.ops.fused_ffn import fused_ffn

        ff = fused_ffn(
            x, lp["intermediate"]["kernel"], lp["intermediate"]["bias"],
            lp["output"]["kernel"], lp["output"]["bias"],
            act=cfg.hidden_act,
        )
    else:
        ff = activation(cfg.hidden_act)(dense(x, lp["intermediate"], precision))
        ff = dense(ff, lp["output"], precision)
    ff = dropout(ff, cfg.hidden_dropout_prob, r_ff, deterministic)
    return layer_norm(x + ff, lp["output_layer_norm"], cfg.layer_norm_eps)


def encoder_layer_cls(
    x: Array,
    lp: dict,
    cfg: BertConfig,
    attn_bias: Optional[Array],
    *,
    precision=None,
) -> Array:
    """Final encoder layer restricted to the [CLS] query position.

    The pooled output depends only on position 0 of the last layer, whose
    attention needs all previous-layer positions as keys/values but only
    one query row — the (S-1)/S share of the last layer's q-projection,
    FFN, and LayerNorm work is skipped. Returns (B, 1, H).
    """
    B, S, H = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    ap = lp["attention"]
    x0 = x[:, :1]
    q = dense(x0, ap["query"], precision).reshape(B, 1, nh, hd)
    k = dense(x, ap["key"], precision).reshape(B, S, nh, hd)
    v = dense(x, ap["value"], precision).reshape(B, S, nh, hd)
    ctx = dot_product_attention(q, k, v, bias=attn_bias, precision=precision)
    attn_out = dense(ctx.reshape(B, 1, H), ap["output"], precision)
    x0 = layer_norm(x0 + attn_out, ap["output_layer_norm"], cfg.layer_norm_eps)
    ff = activation(cfg.hidden_act)(dense(x0, lp["intermediate"], precision))
    ff = dense(ff, lp["output"], precision)
    return layer_norm(x0 + ff, lp["output_layer_norm"], cfg.layer_norm_eps)


def encode(
    params: dict,
    cfg: BertConfig,
    hidden: Array,
    attention_mask: Optional[Array] = None,
    *,
    deterministic: bool = True,
    dropout_rng: Optional[Array] = None,
    precision=None,
    attention_impl: str = "xla",
    remat=False,
    cls_only: bool = False,
) -> Array:
    """Run the stacked encoder with lax.scan over the layer axis.

    ``remat``: False (save everything), True or "full" (checkpoint whole
    layers), or "attention" (selective: recompute only the attention
    block's O(S^2) internals, save FFN activations — less recompute than
    full-layer remat, less memory than none).

    ``cls_only``: compute the LAST layer only for the [CLS] position
    (deterministic pooler paths) — returns (B, 1, H).
    """
    attn_bias = attention_bias_from_mask(attention_mask, jnp.float32)
    mode = "full" if remat is True else (remat or "none")
    assert mode in ("none", "full", "attention", "unroll"), mode
    if cls_only:
        assert deterministic, "cls_only is an inference-path optimization"

    if mode == "unroll":
        # Python-unrolled layer loop: identical math and rng stream to
        # the scan below, but XLA sees the layers as static programs.
        # Opt-in only: measured same-session at the full pre-training
        # step (v5e, B=32, S=512, flash VJP + fused-FFN VJP) it is NOT
        # faster than the scan — 181.0 ex/s vs 185.5 (remat=none) — and
        # compiles ~3x slower, because the backward still materializes
        # per-layer grads into the stacked (L, ...) buffers (one scatter
        # per layer ~= the scan's dynamic-update-slice accumulation).
        # Kept as a measurement mode; see PERF.md round-5 accounting.
        stacked = params["encoder"]
        n_layers = jax.tree.leaves(stacked)[0].shape[0]
        rng = dropout_rng if not deterministic else None
        x_cur = hidden
        for i in range(n_layers - 1 if cls_only else n_layers):
            lp_i = jax.tree.map(lambda t: t[i], stacked)
            if rng is not None:
                rng, sub = jax.random.split(rng)
            else:
                sub = None
            x_cur = encoder_layer(
                x_cur, lp_i, cfg, attn_bias,
                deterministic=deterministic, dropout_rng=sub,
                precision=precision, attention_impl=attention_impl,
            )
        if cls_only:
            last = jax.tree.map(lambda t: t[-1], stacked)
            return encoder_layer_cls(x_cur, last, cfg, attn_bias,
                                     precision=precision)
        return x_cur

    def body(carry, layer_in):
        x, rng = carry
        lp, = layer_in
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        y = encoder_layer(
            x, lp, cfg, attn_bias,
            deterministic=deterministic, dropout_rng=sub,
            precision=precision, attention_impl=attention_impl,
            remat_attention=(mode == "attention"),
        )
        return (y, rng), None

    if mode == "full":
        body = jax.checkpoint(body)

    rng0 = dropout_rng if not deterministic else None
    stacked = params["encoder"]
    if cls_only:
        head_layers = jax.tree.map(lambda x: x[:-1], stacked)
        last = jax.tree.map(lambda x: x[-1], stacked)
        (out, _), _ = jax.lax.scan(body, (hidden, rng0), (head_layers,))
        return encoder_layer_cls(out, last, cfg, attn_bias,
                                 precision=precision)
    (out, _), _ = jax.lax.scan(body, (hidden, rng0), (stacked,))
    return out


def pool(params: dict, sequence_output: Array, precision=None) -> Array:
    """BertPooler: dense+tanh on the [CLS] (first) position."""
    first = sequence_output[:, 0]
    return jnp.tanh(dense(first, params["pooler"], precision))


def bert_model(
    params: dict,
    cfg: BertConfig,
    input_ids: Optional[Array] = None,
    attention_mask: Optional[Array] = None,
    token_type_ids: Optional[Array] = None,
    position_ids: Optional[Array] = None,
    inputs_embeds: Optional[Array] = None,
    *,
    deterministic: bool = True,
    dropout_rng: Optional[Array] = None,
    compute_dtype=jnp.float32,
    precision=None,
    attention_impl: str = "xla",
    remat: bool = False,
    with_pooler: bool = True,
    cls_only: bool = False,
):
    """Full BertModel forward: returns (sequence_output, pooled_output|None).

    ``cls_only``: restrict the last encoder layer to the [CLS] position
    (see ``encode``); the returned sequence output is (B, 1, H)."""
    if not deterministic and dropout_rng is not None:
        r_emb, r_enc = jax.random.split(dropout_rng)
    else:
        r_emb = r_enc = None
    hidden = embed(
        params, cfg, input_ids=input_ids, inputs_embeds=inputs_embeds,
        token_type_ids=token_type_ids, position_ids=position_ids,
        deterministic=deterministic, dropout_rng=r_emb, compute_dtype=compute_dtype,
    )
    if attention_impl == "auto":
        from stonkgs_tpu.ops.attention import resolve_infer_impl

        attention_impl = resolve_infer_impl("auto", hidden.shape[-2])
    seq = encode(
        params, cfg, hidden, attention_mask,
        deterministic=deterministic, dropout_rng=r_enc,
        precision=precision, attention_impl=attention_impl, remat=remat,
        cls_only=cls_only,
    )
    pooled = pool(params, seq, precision) if (with_pooler and "pooler" in params) else None
    return seq, pooled
