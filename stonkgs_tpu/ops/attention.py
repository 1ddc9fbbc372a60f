"""Multi-head attention ops.

Two implementations behind one API:
  * ``impl="xla"`` — einsum softmax attention; XLA fuses it well at seq 512.
  * ``impl="flash"`` — Pallas blockwise flash-attention kernel
    (``stonkgs_tpu.ops.flash_attention``), used on TPU for long sequences
    (ProtSTonKGs, 4096 tokens) and to cut HBM traffic at 512.

Replaces the reference's reliance on torch ATen attention inside HF BERT
(``/root/reference/src/stonkgs/models/stonkgs_model.py:204-210``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def dot_product_attention(
    q: Array,  # (B, S, H, D)
    k: Array,  # (B, S, H, D)
    v: Array,  # (B, S, H, D)
    bias: Optional[Array] = None,  # (B, 1, 1, S) or broadcastable to (B, H, Sq, Sk)
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[Array] = None,
    deterministic: bool = True,
    precision=None,
    impl: str = "xla",
) -> Array:
    """Scaled dot-product attention. Returns (B, S, H, D)."""
    if impl == "flash":
        from stonkgs_tpu.ops.flash_attention import flash_attention_train
        return flash_attention_train(
            q, k, v, bias=bias,
            dropout_rate=0.0 if deterministic else dropout_rate,
            dropout_rng=dropout_rng,
        )
    return _xla_attention(
        q, k, v, bias,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        deterministic=deterministic, precision=precision,
    )


def _xla_attention(
    q: Array, k: Array, v: Array, bias: Optional[Array],
    *, dropout_rate: float, dropout_rng: Optional[Array],
    deterministic: bool, precision,
) -> Array:
    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32)).astype(q.dtype)
    # (B, H, Sq, Sk)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k, precision=precision)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    # softmax in >= fp32 for numerical parity with torch
    f = jnp.promote_types(scores.dtype, jnp.float32)
    probs = jax.nn.softmax(scores.astype(f), axis=-1).astype(q.dtype)
    if not deterministic and dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0).astype(probs.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=precision)
