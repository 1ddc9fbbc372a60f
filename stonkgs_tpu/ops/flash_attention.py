"""Pallas TPU attention kernel.

Blockwise attention for the STonKGs encoders (seq 512 / 260 / 4096,
head_dim 64).  Each grid program computes one query block against the full
key/value sequence, with the softmax reduction done in fp32 in VMEM — one
HBM round trip for q/k/v and none for the (Sq, Sk) score matrix, which is
what dominates HBM traffic in the naive implementation.

Key/value fit comfortably in VMEM at these sequence lengths (4096 x 64 x 4B
= 1 MiB), so no online-softmax accumulation across k blocks is needed:
a single max-subtracted softmax per q block is exact.

On non-TPU backends the kernel runs in interpret mode (tests) — production
CPU paths should use ``impl="xla"``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)          # (bq, D)
    k = k_ref[0, 0].astype(jnp.float32)          # (S, D)
    v = v_ref[0, 0]                              # (S, D)
    s = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (bq, S)
    s = s + bias_ref[0, 0]                       # additive key bias (S,)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / denom).astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(
    q: Array,  # (B, S, H, D)
    k: Array,
    v: Array,
    bias: Optional[Array] = None,  # (B, 1, 1, S) additive key bias
    *,
    block_q: int = 256,
    interpret: Optional[bool] = None,
) -> Array:
    """Attention with softmax over the full key axis. Returns (B, S, H, D)."""
    B, S, H, D = q.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    scale = 1.0 / (D ** 0.5)

    # (B, H, S, D) layout for blocked access
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    key_bias = (
        bias[:, 0, 0, :].astype(jnp.float32) if bias is not None
        else jnp.zeros((B, S), jnp.float32)
    )

    # pad sequence to a block multiple; padded keys get -1e9 bias
    bq = min(block_q, S)
    S_pad = -(-S // bq) * bq
    if S_pad != S:
        pad = S_pad - S
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        key_bias = jnp.pad(key_bias, ((0, 0), (0, pad)), constant_values=-1e9)
    # (B, 1, S): TPU block shapes need the 2nd-to-last dim to tile legally
    key_bias = key_bias[:, None, :]

    grid = (B, H, S_pad // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S_pad, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S_pad * S_pad * D,
            bytes_accessed=(3 * B * H * S_pad * D + B * H * S_pad * D) * q.dtype.itemsize,
            transcendentals=B * H * S_pad * S_pad,
        ),
        interpret=interpret,
    )(qt, kt, vt, key_bias)

    out = out[:, :, :S, :]
    return jnp.transpose(out, (0, 2, 1, 3))
