"""Op-level flash-attention kernel efficiency (extraction + training).

Pins the Pallas kernels against XLA and against their MXU floor at the two
production shapes (reference attention: the trunk self-attention inside
``/root/reference/src/stonkgs/models/stonkgs_model.py:204-210``):

  * extraction: B=128, S=512, 12 heads, D=64, bf16, inference kernel
  * training:   B=32,  S=512, 12 heads, D=64, bf16, train kernel fwd+bwd

The floor is the pure dot-product pair (QK^T + PV as plain XLA batched
GEMMs, no softmax) — attention cannot beat it, and the gap to it is the
softmax VPU time plus kernel inefficiency.  D=64 fills half the 128-wide
MXU contraction, so the *practical* ceiling for these dots is ~half the
bf16 GEMM peak.

Prints one JSON line per ablation.
"""

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import emit, timed_op  # noqa: E402

from stonkgs_tpu.ops import flash_attention as fa  # noqa: E402


def _mk(B, S, H, D, dtype=jnp.bfloat16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (B, S, H, D), dtype)
    k = jax.random.normal(ks[1], (B, S, H, D), dtype)
    v = jax.random.normal(ks[2], (B, S, H, D), dtype)
    bias = jnp.zeros((B, 1, 1, S), jnp.float32)
    return q, k, v, bias


def _xla_attention(q, k, v, bias, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale + bias
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _dot_floor(q, k, v):
    # QK^T + PV as plain batched GEMMs — p replaced by a bf16 reuse of s
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", s, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def main(S: int = 512, H: int = 12, D: int = 64, steps: int = 30,
         infer_batch: int = 128, train_batch: int = 32):
    scale = 1.0 / D ** 0.5

    # --- inference shape -------------------------------------------------
    B = infer_batch
    q, k, v, bias = _mk(B, S, H, D)
    flops_fwd = 4 * B * H * S * S * D

    infer = jax.jit(lambda q, k, v, b: fa.flash_attention_infer(q, k, v, b))
    xla = jax.jit(lambda q, k, v, b: _xla_attention(q, k, v, b, scale))
    floor = jax.jit(_dot_floor)

    dt = timed_op(infer, (q, k, v, bias), steps=steps)
    emit(f"attn fwd: Pallas infer kernel (B={B}, S={S})", dt * 1e3, "ms",
         tflops=round(flops_fwd / dt / 1e12, 1))
    dt = timed_op(xla, (q, k, v, bias), steps=steps)
    emit(f"attn fwd: XLA (B={B}, S={S})", dt * 1e3, "ms",
         tflops=round(flops_fwd / dt / 1e12, 1))
    dt = timed_op(floor, (q, k, v), steps=steps)
    emit(f"attn fwd: dot floor (B={B}, S={S})", dt * 1e3, "ms",
         tflops=round(flops_fwd / dt / 1e12, 1))

    # --- training shape (fwd+bwd) ----------------------------------------
    B = train_batch
    q, k, v, bias = _mk(B, S, H, D)
    # fwd 2 dots + bwd recompute 1 + dv/dp/dq/dk 4 = 7 S^2 D dots
    flops_fb = 14 * B * H * S * S * D

    def loss_train(q, k, v, b):
        return jnp.sum(fa.flash_attention_train(q, k, v, b)
                       .astype(jnp.float32))

    def loss_xla(q, k, v, b):
        return jnp.sum(_xla_attention(q, k, v, b, scale)
                       .astype(jnp.float32))

    def gradsum(g):
        return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(g))

    train_fb = jax.jit(lambda *a: gradsum(jax.grad(
        loss_train, argnums=(0, 1, 2))(*a))[None])
    xla_fb = jax.jit(lambda *a: gradsum(jax.grad(
        loss_xla, argnums=(0, 1, 2))(*a))[None])

    dt = timed_op(train_fb, (q, k, v, bias), steps=steps)
    emit(f"attn fwd+bwd: Pallas train kernel (B={B}, S={S})", dt * 1e3, "ms",
         tflops=round(flops_fb / dt / 1e12, 1))
    dt = timed_op(xla_fb, (q, k, v, bias), steps=steps)
    emit(f"attn fwd+bwd: XLA (B={B}, S={S})", dt * 1e3, "ms",
         tflops=round(flops_fb / dt / 1e12, 1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--infer-batch", type=int, default=128)
    ap.add_argument("--train-batch", type=int, default=32)
    a = ap.parse_args()
    main(S=a.S, steps=a.steps, infer_batch=a.infer_batch,
         train_batch=a.train_batch)
