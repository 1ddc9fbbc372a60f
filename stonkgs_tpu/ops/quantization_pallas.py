"""Fused int8 dense kernel (Pallas): quantize -> int8 MXU GEMM -> dequant.

The XLA lowering of ``ops.quantization.dense_int8`` round-trips the
quantized activations and the int32 accumulator through HBM between the
VPU quantization/dequantization stages and the MXU matmul. This kernel
fuses the whole pipeline per row tile: dynamic per-row absmax
quantization, the int8 x int8 -> int32 matmul, and the
``acc * x_scale * w_scale + bias`` epilogue all stay in VMEM.

Numerics are identical to ``dense_int8`` (same symmetric absmax formula);
pinned by interpreter-mode tests. The weight matrix stays resident in
VMEM across row tiles (the grid varies only the row index), so HBM
traffic is x once in, y once out.

Used for encoder-sized layers (K, N multiples of 128 and small enough for
VMEM); other shapes fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# row tile; K and N are taken whole (encoder layers: K, N <= 3072)
TILE_M = 256
# VMEM budget gate for keeping W + tiles resident (bytes)
_MAX_W_BYTES = 8 * 1024 * 1024


def _fused_kernel(x_ref, wq_ref, wscale_ref, bias_ref, o_ref, *, out_dtype):
    xf = x_ref[:].astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s * wscale_ref[0][None, :]
    y = y + bias_ref[0][None, :]
    o_ref[:] = y.astype(out_dtype)


def supported(kernel_q: jax.Array) -> bool:
    """Shapes this kernel handles (otherwise the XLA path is used)."""
    K, N = kernel_q.shape[-2:]
    return (kernel_q.ndim == 2 and K % 128 == 0 and N % 128 == 0
            and K * N <= _MAX_W_BYTES)


def dense_int8_fused(
    x: jax.Array,            # (..., K) float
    kernel_q: jax.Array,     # (K, N) int8
    w_scale: jax.Array,      # (N,) float32
    bias=None,               # (N,) or None
    *,
    interpret: bool = False,
) -> jax.Array:
    """y = dequant(quant_rows(x) @ kernel_q) + bias, fused in VMEM."""
    K, N = kernel_q.shape
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    xf = x.reshape(M, K)
    pad = (-M) % TILE_M
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    Mp = M + pad

    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    kern = functools.partial(_fused_kernel, out_dtype=x.dtype)
    y = pl.pallas_call(
        kern,
        grid=(Mp // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, K), lambda i: (i, 0)),
            pl.BlockSpec((K, N), lambda i: (0, 0)),
            pl.BlockSpec((1, N), lambda i: (0, 0)),
            pl.BlockSpec((1, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_M, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * x.dtype.itemsize + K * N + Mp * N
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, kernel_q,
      w_scale.astype(jnp.float32).reshape(1, N),
      jnp.asarray(bias, jnp.float32).reshape(1, N))
    if pad:
        y = y[:M]
    return y.reshape(*lead, N)
