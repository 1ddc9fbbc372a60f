"""Op-level fused-FFN forward/backward efficiency (training roofline input).

The fused-FFN custom VJP recomputes the unfused XLA chain in backward
(``ops/fused_ffn._fused_ffn_bwd``) — that recompute is what freed the
bf16[L, B, S, 4H] HBM saves and broke the round-3 OOM walls (PERF.md
round 4), but it leaves the BACKWARD on XLA: the recomputed (M, I)
intermediate and the dgelu chain materialize in HBM within the backward
computation.  This bench pins how far that backward sits from its GEMM
floor, at the trunk training shape (reference FFN pair:
``/root/reference/src/stonkgs/models/stonkgs_model.py:204-210``).

Measured ablations (bf16, fp32 accumulation):
  fwd:  Pallas fused kernel / unfused XLA / pure 2-GEMM floor
  bwd:  recompute-VJP (production) / stored-h XLA VJP / 5-GEMM floor

Prints one JSON line per ablation.
"""

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import emit, timed_op  # noqa: E402

from stonkgs_tpu.ops import fused_ffn as ff  # noqa: E402


def main(M: int = 16384, H: int = 768, I: int = 3072, steps: int = 30):
    key = jax.random.PRNGKey(0)
    kx, k1, k2 = jax.random.split(key, 3)
    x = jax.random.normal(kx, (M, H), jnp.bfloat16)
    w1 = jax.random.normal(k1, (H, I), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((I,), jnp.float32)
    w2 = jax.random.normal(k2, (I, H), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((H,), jnp.float32)
    gemm_flops = 4 * M * H * I           # two GEMMs, 2*M*H*I each

    def tflops(dt, n_gemms):
        return n_gemms * 2 * M * H * I / dt / 1e12

    # --- forward ---------------------------------------------------------
    fused_fwd = jax.jit(lambda x, w1, b1, w2, b2: ff.fused_ffn(
        x, w1, b1, w2, b2))
    xla_fwd = jax.jit(lambda x, w1, b1, w2, b2: ff._ffn_reference(
        x, w1, b1, w2, b2))
    gemm_fwd = jax.jit(lambda x, w1, w2: jnp.dot(
        jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(x.dtype),
        w2, preferred_element_type=jnp.float32).astype(x.dtype))

    dt = timed_op(fused_fwd, (x, w1, b1, w2, b2), steps=steps)
    emit("ffn fwd: Pallas fused", dt * 1e3, "ms", tflops=round(tflops(dt, 2), 1))
    dt = timed_op(xla_fwd, (x, w1, b1, w2, b2), steps=steps)
    emit("ffn fwd: XLA unfused", dt * 1e3, "ms", tflops=round(tflops(dt, 2), 1))
    dt = timed_op(gemm_fwd, (x, w1, w2), steps=steps)
    emit("ffn fwd: 2-GEMM floor", dt * 1e3, "ms", tflops=round(tflops(dt, 2), 1))

    # --- backward (fwd+bwd timed together, as training pays it) ----------
    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(ff.fused_ffn(x, w1, b1, w2, b2).astype(jnp.float32))

    def loss_xla(x, w1, b1, w2, b2):
        return jnp.sum(ff._ffn_reference(x, w1, b1, w2, b2)
                       .astype(jnp.float32))

    def gradsum(g):  # reduce over all grads so nothing is DCE'd
        return sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(g))

    fused_fb = jax.jit(lambda *a: gradsum(jax.grad(
        loss_fused, argnums=(0, 1, 2, 3, 4))(*a))[None])
    xla_fb = jax.jit(lambda *a: gradsum(jax.grad(
        loss_xla, argnums=(0, 1, 2, 3, 4))(*a))[None])

    # 5-GEMM floor for the recompute backward: recompute h, dh=g@w2^T,
    # dw2=h^T@g, dx=dh@w1^T, dw1=x^T@dh (plus the 2 forward GEMMs = 7)
    def gemm_floor7(x, w1, w2, g):
        f32 = jnp.float32
        h = jnp.dot(x, w1, preferred_element_type=f32).astype(x.dtype)
        y = jnp.dot(h, w2, preferred_element_type=f32).astype(x.dtype)
        h2 = jnp.dot(x, w1, preferred_element_type=f32).astype(x.dtype)
        dh = jnp.dot(g, w2.T, preferred_element_type=f32).astype(x.dtype)
        dw2 = jnp.dot(h2.T, g, preferred_element_type=f32).astype(x.dtype)
        dx = jnp.dot(dh, w1.T, preferred_element_type=f32).astype(x.dtype)
        dw1 = jnp.dot(x.T, dh, preferred_element_type=f32).astype(x.dtype)
        return (jnp.sum(y.astype(f32)) + jnp.sum(dh.astype(f32))
                + jnp.sum(dw2.astype(f32)) + jnp.sum(dx.astype(f32))
                + jnp.sum(dw1.astype(f32)))[None]

    g = jax.random.normal(jax.random.PRNGKey(7), (M, H), jnp.bfloat16)
    gemm_fb = jax.jit(gemm_floor7)

    # production path: Pallas fwd kernel + Pallas bwd kernel (recompute +
    # all five backward GEMMs in one call, (M, I) chains never in HBM)
    ff.BWD_IMPL = "auto"
    dt = timed_op(fused_fb, (x, w1, b1, w2, b2), steps=steps)
    emit("ffn fwd+bwd: Pallas bwd kernel (production)", dt * 1e3, "ms",
         tflops=round(tflops(dt, 7), 1))
    ff.BWD_IMPL = "xla"
    dt = timed_op(jax.jit(lambda *a: gradsum(jax.grad(
        loss_fused, argnums=(0, 1, 2, 3, 4))(*a))[None]),
        (x, w1, b1, w2, b2), steps=steps)
    emit("ffn fwd+bwd: XLA recompute VJP (round-4 production)", dt * 1e3,
         "ms", tflops=round(tflops(dt, 7), 1))
    ff.BWD_IMPL = "auto"
    dt = timed_op(xla_fb, (x, w1, b1, w2, b2), steps=steps)
    emit("ffn fwd+bwd: stored-h XLA VJP", dt * 1e3, "ms",
         tflops=round(tflops(dt, 6), 1))
    dt = timed_op(gemm_fb, (x, w1, w2, g), steps=steps)
    emit("ffn fwd+bwd: 7-GEMM floor", dt * 1e3, "ms",
         tflops=round(tflops(dt, 7), 1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=16384)
    ap.add_argument("--H", type=int, default=768)
    ap.add_argument("--I", type=int, default=3072)
    ap.add_argument("--steps", type=int, default=30)
    a = ap.parse_args()
    main(a.M, a.H, a.I, a.steps)
