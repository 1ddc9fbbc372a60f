"""Functional BigBird encoder (HF ``BigBirdModel`` semantics).

Trunk of ProtSTonKGs (reference ``/root/reference/src/stonkgs/models/
protstonkgs_model.py:137-149``).  Differences from BERT worth noting:

  * embeddings apply **dropout before LayerNorm** (HF BigBirdEmbeddings),
    optional sqrt(hidden) rescale,
  * attention is either ``original_full`` (dense, BERT-like) or
    ``block_sparse`` (``stonkgs_tpu.ops.bigbird_sparse``); HF auto-falls
    back to full attention when seq_len <= (5 + 2*num_random_blocks) *
    block_size — replicated here,
  * the pooler is ``pooler.weight``/``pooler.bias`` + tanh (no ``.dense``),
  * q/k/v biases are controlled by ``use_bias``.

Per-layer random-attention plans are host-precomputed static constants
(see ``ops.bigbird_sparse.build_rand_attn``) and threaded through the
``lax.scan`` over stacked layers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stonkgs_tpu.config import BigBirdConfig
from stonkgs_tpu.models.bert import (
    _init_dense, _init_layer_norm, _trunc_normal,
    activation, dense, dropout, layer_norm,
)
from stonkgs_tpu.ops.attention import dot_product_attention
from stonkgs_tpu.ops.bigbird_sparse import block_sparse_attention, build_rand_attn

Array = jax.Array


def init_bigbird_params(key: Array, cfg: BigBirdConfig, with_pooler: bool = True) -> dict:
    """Stacked-layer BigBird parameter tree (scanned encoder layout)."""
    k_emb, k_layers, k_pool = jax.random.split(key, 3)
    h, std = cfg.hidden_size, cfg.initializer_range
    k1, k2, k3 = jax.random.split(k_emb, 3)
    params = {
        "embeddings": {
            "word_embeddings": _trunc_normal(k1, (cfg.vocab_size, h), std),
            "position_embeddings": _trunc_normal(
                k2, (cfg.max_position_embeddings, h), std),
            "token_type_embeddings": _trunc_normal(
                k3, (cfg.type_vocab_size, h), std),
            "layer_norm": _init_layer_norm(h),
        }
    }

    def init_layer(k):
        ks = jax.random.split(k, 6)
        lp = {
            "attention": {
                "query": _init_dense(ks[0], h, h, std),
                "key": _init_dense(ks[1], h, h, std),
                "value": _init_dense(ks[2], h, h, std),
                "output": _init_dense(ks[3], h, h, std),
                "output_layer_norm": _init_layer_norm(h),
            },
            "intermediate": _init_dense(ks[4], h, cfg.intermediate_size, std),
            "output": _init_dense(ks[5], cfg.intermediate_size, h, std),
            "output_layer_norm": _init_layer_norm(h),
        }
        if not cfg.use_bias:
            for name in ("query", "key", "value"):
                lp["attention"][name].pop("bias")
        return lp

    layers = [init_layer(k) for k in jax.random.split(k_layers, cfg.num_hidden_layers)]
    params["encoder"] = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers)
    if with_pooler:
        params["pooler"] = _init_dense(k_pool, h, h, std)
    return params


def embed(
    params: dict, cfg: BigBirdConfig,
    input_ids=None, inputs_embeds=None,
    token_type_ids=None, position_ids=None,
    *, deterministic=True, dropout_rng=None, compute_dtype=jnp.float32,
) -> Array:
    """BigBirdEmbeddings: word(+rescale) + tt + pos, dropout, THEN LayerNorm."""
    p = params["embeddings"]
    if inputs_embeds is None:
        inputs_embeds = jnp.take(p["word_embeddings"], input_ids, axis=0)
    x = inputs_embeds.astype(compute_dtype)
    if getattr(cfg, "rescale_embeddings", False):
        x = x * (cfg.hidden_size ** 0.5)
    S = x.shape[-2]
    if position_ids is None:
        position_ids = jnp.arange(S)[None, :]
    if token_type_ids is None:
        token_type_ids = jnp.zeros(x.shape[:-1], jnp.int32)
    x = x + jnp.take(p["token_type_embeddings"], token_type_ids, axis=0).astype(compute_dtype)
    x = x + jnp.take(p["position_embeddings"], position_ids, axis=0).astype(compute_dtype)
    x = dropout(x, cfg.hidden_dropout_prob, dropout_rng, deterministic)
    return layer_norm(x, p["layer_norm"], cfg.layer_norm_eps)


def effective_attention_type(cfg: BigBirdConfig, seq_len: int) -> str:
    """HF fallback: block_sparse needs seq_len > (5+2r)*block."""
    if cfg.attention_type == "block_sparse":
        if seq_len <= (5 + 2 * cfg.num_random_blocks) * cfg.block_size:
            return "original_full"
        return "block_sparse"
    return "original_full"


def bigbird_model(
    params: dict,
    cfg: BigBirdConfig,
    input_ids: Optional[Array] = None,
    attention_mask: Optional[Array] = None,
    token_type_ids: Optional[Array] = None,
    inputs_embeds: Optional[Array] = None,
    *,
    deterministic: bool = True,
    dropout_rng: Optional[Array] = None,
    compute_dtype=jnp.float32,
    precision=None,
    remat: bool = False,
    with_pooler: bool = True,
    rand_attn: Optional[np.ndarray] = None,  # (L, H, nb-2, r) static
    attention_type: Optional[str] = None,    # override cfg.attention_type
    attention_impl: str = "xla",             # dense path: "xla" | "flash"
    sparse_impl: str = "auto",               # sparse path: "auto"|"xla"|"pallas"
    cls_only: bool = False,                  # last layer at [CLS] only
) -> Tuple[Array, Optional[Array]]:
    """Full BigBirdModel forward -> (sequence_output, pooled).

    ``cls_only`` computes the LAST layer only for the [CLS] query
    (deterministic pooled paths). Exact under block-sparse semantics too:
    the first query block attends the full sequence (HF part 1), so the
    [CLS] row is plain dense attention."""
    if not deterministic and dropout_rng is not None:
        r_emb, r_enc = jax.random.split(dropout_rng)
    else:
        r_emb = r_enc = None
    hidden = embed(
        params, cfg, input_ids=input_ids, inputs_embeds=inputs_embeds,
        token_type_ids=token_type_ids,
        deterministic=deterministic, dropout_rng=r_emb,
        compute_dtype=compute_dtype,
    )
    B, S, H = hidden.shape
    if attention_type is not None:
        cfg_eff = dataclasses.replace(cfg, attention_type=attention_type)
    else:
        cfg_eff = cfg
    attn_type = effective_attention_type(cfg_eff, S)
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.float32)

    if attn_type == "block_sparse":
        assert S % cfg.block_size == 0, "seq len must be multiple of block size"
        if rand_attn is None:
            rand_attn = build_rand_attn(
                S, cfg.block_size, cfg.num_random_blocks,
                cfg.num_attention_heads, cfg.num_hidden_layers,
                cfg.max_position_embeddings, training=not deterministic,
            )
        rand_attn = jnp.asarray(rand_attn)
        attn_bias = None
    else:
        attn_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
        rand_attn = jnp.zeros(
            (cfg.num_hidden_layers, cfg.num_attention_heads, 1, 1), jnp.int32)

    nh, hd = cfg.num_attention_heads, cfg.head_dim
    mask_f = attention_mask.astype(jnp.float32)

    def layer(x, lp, la_rand, rng):
        ap = lp["attention"]
        if rng is not None:
            r_attn, r_ao, r_ff = jax.random.split(rng, 3)
        else:
            r_attn = r_ao = r_ff = None

        def attn_block(x, ap, la_rand):
            q = dense(x, ap["query"], precision).reshape(B, S, nh, hd)
            k = dense(x, ap["key"], precision).reshape(B, S, nh, hd)
            v = dense(x, ap["value"], precision).reshape(B, S, nh, hd)
            if attn_type == "block_sparse":
                # The Pallas kernel has a custom VJP
                # (ops/bigbird_sparse_pallas), so it serves both inference
                # and training on TPU; the XLA lowering remains for CPU
                # and as the parity oracle.
                use_pallas = sparse_impl == "pallas" or (
                    sparse_impl == "auto"
                    and jax.default_backend() == "tpu"
                    and S // cfg.block_size >= 5
                )
                if use_pallas:
                    from stonkgs_tpu.ops.bigbird_sparse_pallas import (
                        block_sparse_attention_pallas,
                    )

                    sparse_fn = block_sparse_attention_pallas
                else:
                    sparse_fn = block_sparse_attention
                ctx = sparse_fn(
                    q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3),
                    la_rand, mask_f, cfg.block_size, precision=precision,
                ).transpose(0, 2, 1, 3)
            else:
                ctx = dot_product_attention(
                    q, k, v, bias=attn_bias,
                    dropout_rate=cfg.attention_probs_dropout_prob,
                    dropout_rng=r_attn, deterministic=deterministic,
                    precision=precision, impl=attention_impl,
                )
            return dense(ctx.reshape(B, S, H), ap["output"], precision)

        if remat == "attention":
            # selective remat (mirrors bert.encoder_layer): recompute only
            # the attention sub-block in the backward pass; the FFN
            # activations (cheap to store relative to the (B, nh, S, ...)
            # attention intermediates at seq 4096) are saved
            attn_block = jax.checkpoint(attn_block)
        attn_out = attn_block(x, ap, la_rand)
        fusable_ffn = (
            precision is None
            and cfg.hidden_act in ("gelu", "gelu_new")
            and "kernel" in lp["intermediate"]
            and "kernel" in lp["output"]
            and jax.default_backend() == "tpu"
        )
        if deterministic and fusable_ffn:
            # inference: whole post-attention half in one kernel (see
            # bert.encoder_layer) — both LN HBM passes fused away
            from stonkgs_tpu.ops.fused_ffn import fused_ffn_ln_block

            return fused_ffn_ln_block(
                x, attn_out,
                ap["output_layer_norm"]["scale"],
                ap["output_layer_norm"]["bias"],
                lp["intermediate"]["kernel"], lp["intermediate"]["bias"],
                lp["output"]["kernel"], lp["output"]["bias"],
                lp["output_layer_norm"]["scale"],
                lp["output_layer_norm"]["bias"],
                act=cfg.hidden_act, eps=cfg.layer_norm_eps,
            )
        attn_out = dropout(attn_out, cfg.hidden_dropout_prob, r_ao, deterministic)
        x = layer_norm(x + attn_out, ap["output_layer_norm"], cfg.layer_norm_eps)
        if fusable_ffn:
            # fused Pallas FFN (see bert.encoder_layer): VMEM-resident
            # intermediate, custom VJP recomputes — at seq 4096 the saved
            # bf16[L, B, S, 4H] buffers are what OOMed B=8 training
            from stonkgs_tpu.ops.fused_ffn import fused_ffn

            ff = fused_ffn(
                x, lp["intermediate"]["kernel"], lp["intermediate"]["bias"],
                lp["output"]["kernel"], lp["output"]["bias"],
                act=cfg.hidden_act,
            )
        else:
            ff = activation(cfg.hidden_act)(
                dense(x, lp["intermediate"], precision))
            ff = dense(ff, lp["output"], precision)
        ff = dropout(ff, cfg.hidden_dropout_prob, r_ff, deterministic)
        return layer_norm(x + ff, lp["output_layer_norm"], cfg.layer_norm_eps)

    def layer_cls(x, lp):
        """Last layer, [CLS] query only. Under block-sparse, row 0 is a
        dense full-attention row with the -10000 mask penalty and a
        query-mask multiply (``bigbird_sparse.block_sparse_attention``
        part 1); under original_full it is the ordinary dense row."""
        from stonkgs_tpu.ops.bigbird_sparse import ATTN_PENALTY

        ap = lp["attention"]
        x0 = x[:, :1]
        q = dense(x0, ap["query"], precision).reshape(B, 1, nh, hd)
        k = dense(x, ap["key"], precision).reshape(B, S, nh, hd)
        v = dense(x, ap["value"], precision).reshape(B, S, nh, hd)
        if attn_type == "block_sparse":
            bias0 = ((1.0 - mask_f) * ATTN_PENALTY)[:, None, None, :]
            ctx = dot_product_attention(q, k, v, bias=bias0,
                                        precision=precision)
            ctx = ctx * mask_f[:, :1, None, None].astype(ctx.dtype)
        else:
            ctx = dot_product_attention(q, k, v, bias=attn_bias,
                                        precision=precision)
        attn_out = dense(ctx.reshape(B, 1, H), ap["output"], precision)
        x0 = layer_norm(x0 + attn_out, ap["output_layer_norm"],
                        cfg.layer_norm_eps)
        ff = activation(cfg.hidden_act)(dense(x0, lp["intermediate"],
                                              precision))
        ff = dense(ff, lp["output"], precision)
        return layer_norm(x0 + ff, lp["output_layer_norm"],
                          cfg.layer_norm_eps)

    def body(carry, xs):
        x, rng = carry
        lp, la_rand = xs
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        return (layer(x, lp, la_rand, sub), rng), None

    # remat="attention" -> selective (attention-only) checkpoint, applied
    # inside ``layer``; remat="unroll" is a BERT-trunk mode (see
    # bert.encode) and means no-remat here; any other truthy value ->
    # conservative full-layer checkpoint
    if remat and remat not in ("attention", "unroll"):
        body = jax.checkpoint(body)
    rng0 = dropout_rng if not deterministic else None
    if cls_only:
        assert deterministic, "cls_only is an inference-path optimization"
        head_layers = jax.tree.map(lambda x: x[:-1], params["encoder"])
        last = jax.tree.map(lambda x: x[-1], params["encoder"])
        (x_pre, _), _ = jax.lax.scan(
            body, (hidden, rng0), (head_layers, rand_attn[:-1]))
        seq = layer_cls(x_pre, last)
    else:
        (seq, _), _ = jax.lax.scan(
            body, (hidden, rng0), (params["encoder"], rand_attn))

    pooled = None
    if with_pooler and "pooler" in params:
        pooled = jnp.tanh(dense(seq[:, 0], params["pooler"], precision))
    return seq, pooled


def bigbird_params_from_state_dict(sd, cfg: BigBirdConfig, prefix: str = "") -> dict:
    """HF BigBirdModel state dict subtree -> stacked param tree."""
    from stonkgs_tpu.utils.hf_loader import _dense, _ln, _np

    g = lambda k: prefix + k  # noqa: E731
    params = {
        "embeddings": {
            "word_embeddings": _np(sd[g("embeddings.word_embeddings.weight")]),
            "position_embeddings": _np(sd[g("embeddings.position_embeddings.weight")]),
            "token_type_embeddings": _np(sd[g("embeddings.token_type_embeddings.weight")]),
            "layer_norm": _ln(sd, g("embeddings.LayerNorm")),
        }
    }
    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = g(f"encoder.layer.{i}.")
        layers.append({
            "attention": {
                "query": _dense(sd, lp + "attention.self.query"),
                "key": _dense(sd, lp + "attention.self.key"),
                "value": _dense(sd, lp + "attention.self.value"),
                "output": _dense(sd, lp + "attention.output.dense"),
                "output_layer_norm": _ln(sd, lp + "attention.output.LayerNorm"),
            },
            "intermediate": _dense(sd, lp + "intermediate.dense"),
            "output": _dense(sd, lp + "output.dense"),
            "output_layer_norm": _ln(sd, lp + "output.LayerNorm"),
        })
    params["encoder"] = jax.tree.map(lambda *xs: np.stack(xs, 0), *layers)
    if g("pooler.weight") in sd:
        params["pooler"] = {
            "kernel": _np(sd[g("pooler.weight")]).T,
            "bias": _np(sd[g("pooler.bias")]),
        }
    return params
