"""Int8 quantized inference (serving speed mode).

v5e's MXU runs int8 at 2x the bf16 rate; for serving-only workloads
(embedding extraction, classification) the dense kernels can run as
int8 x int8 -> int32 with per-output-channel weight scales and dynamic
per-row activation scales (symmetric, absmax).  This is an OPT-IN
approximation — the parity path stays bf16/fp32.

Usage: ``params_q = quantize_params(params)`` then the standard forwards —
``models.bert.dense`` dispatches to the quantized kernel automatically when
a leaf carries ``kernel_q``.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# dense kernels quantized when their input dim is at least this (skips
# tiny projections where quantization overhead dominates)
MIN_QUANT_DIM = 64


def quantize_kernel(kernel: Array) -> dict:
    """(in, out) or stacked (L, in, out) kernel -> int8 + per-out-channel
    scales ((out,) or (L, out)); stacked kernels are sliced per layer by
    the encoder's lax.scan."""
    k = np.asarray(kernel, np.float32)
    axis = k.ndim - 2  # the `in` axis
    scale = np.max(np.abs(k), axis=axis) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(k / np.expand_dims(scale, axis)), -127, 127).astype(np.int8)
    return {"kernel_q": jnp.asarray(q), "scale": jnp.asarray(scale, jnp.float32)}


def dense_int8(x: Array, p: Mapping, precision=None) -> Array:
    """y = dequant(quant(x) @ kernel_q) + bias.

    Dynamic symmetric per-row activation quantization; accumulation in
    int32 on the MXU. On TPU, encoder-sized layers dispatch to the fused
    Pallas kernel (quant + GEMM + dequant in VMEM,
    ``ops/quantization_pallas.py``); other shapes use the XLA lowering."""
    if p["kernel_q"].ndim == 2 and jax.default_backend() == "tpu":
        from stonkgs_tpu.ops.quantization_pallas import (
            dense_int8_fused, supported,
        )

        if supported(p["kernel_q"]):
            return dense_int8_fused(
                x, p["kernel_q"], p["scale"], p.get("bias"))
    f = x.dtype
    xf = x.astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    x_scale = jnp.maximum(x_scale, 1e-12)
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, p["kernel_q"],
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * p["scale"]
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(f)


def _is_dense(leaf) -> bool:
    return (isinstance(leaf, Mapping) and "kernel" in leaf
            and getattr(leaf["kernel"], "ndim", 0) in (2, 3))


def quantize_params(params, *, skip_keys=("pooler",)) -> dict:
    """Quantize every eligible dense kernel in a parameter tree.

    Embedding tables, LayerNorms, biases, and ``skip_keys`` subtrees (the
    tanh pooler is scale-sensitive) stay in their original dtype."""

    def rec(tree, path):
        if _is_dense(tree) and not (path and path[-1] in skip_keys):
            kernel = tree["kernel"]
            if kernel.shape[-2] >= MIN_QUANT_DIM and kernel.shape[-1] >= MIN_QUANT_DIM:
                out = quantize_kernel(kernel)
                if "bias" in tree:
                    out["bias"] = tree["bias"]
                return out
        if isinstance(tree, Mapping):
            return {k: rec(v, path + (k,)) for k, v in tree.items()}
        return tree

    return rec(params, ())
