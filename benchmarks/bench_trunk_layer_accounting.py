"""Within-trunk per-layer accounting for the pre-training step.

`bench_train_accounting.py` shows the trunk fwd+bwd is 139.4 ms of the
173.5 ms full step (80%).  This bench decomposes ONE trunk layer at the
exact step shapes (B=32, S=512, H=768, bf16, flash VJP + fused-FFN VJP,
deterministic — the accounting component's configuration) into its four
sub-blocks, each timed standalone with fixed cotangents:

  layer fwd+bwd = QKVO GEMMs fwd+bwd      (4 dense 768x768, grads wrt x+W)
                + attention kernel VJP     (flash, no S^2 HBM)
                + fused-FFN VJP            (recompute custom VJP)
                + 2x residual+LayerNorm VJP

and checks the sub-block sum against the measured whole layer, and
12x the layer against the trunk component.  The floors quoted are the
round-4 measured kernel/GEMM rates (PERF.md op-level table) — i.e. the
best KNOWN realizable time per op on this chip, not a paper bound.

Prints one JSON line per row plus a summary line.
"""

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import emit, full_scale_config, init_params, timed_op  # noqa: E402

from stonkgs_tpu.models import bert  # noqa: E402


def grad_reduce(f, argnums):
    """jit(sum of |grads|) — forces the whole backward to execute."""
    g = jax.grad(f, argnums=argnums)

    def run(*args):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))),
            g(*args), jnp.float32(0.0))[None]

    return jax.jit(run)


def main(batch_size: int = 32, steps: int = 20, smoke: bool = False):
    if smoke:
        from stonkgs_tpu.config import BertConfig, STonKGsConfig

        cfg = STonKGsConfig(
            bert=BertConfig(vocab_size=97, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=64),
            kg_vocab_size=61, text_len=16, entity_len=8)
        batch_size, steps = 2, 1
    else:
        cfg = full_scale_config()
    bc = cfg.bert
    B, S, H = batch_size, cfg.text_len + cfg.entity_len, bc.hidden_size
    nh, hd = bc.num_attention_heads, bc.head_dim
    params = init_params(cfg)
    lp = params["trunk"]["encoder"]  # scanned pytree: leaves (L, ...)
    lp1 = jax.tree.map(lambda x: x[0], lp)
    key = jax.random.PRNGKey(0)
    x = jax.device_put(
        jax.random.normal(key, (B, S, H), jnp.bfloat16))
    rows = []

    def row(name, dt, floor_ms=None):
        ms = dt * 1e3
        rows.append((name, ms, floor_ms))
        emit(f"trunk layer accounting: {name} (B={B})", ms, "ms",
             floor_ms=floor_ms)
        return ms

    # --- whole layer fwd+bwd (flash + fused-FFN VJP), the thing to explain
    def layer_obj(xx, p):
        y = bert.encoder_layer(xx, p, bc, None, deterministic=True,
                               attention_impl="flash")
        return jnp.sum(y.astype(jnp.float32))

    dt_layer = timed_op(grad_reduce(layer_obj, (0, 1)), (x, lp1),
                        steps=steps)
    layer_ms = row("WHOLE LAYER fwd+bwd (flash VJP + fused-FFN VJP)",
                   dt_layer)

    # --- sub-block 1: QKVO GEMMs fwd+bwd (4x dense HxH, grads wrt x and W)
    ap = lp1["attention"]

    def qkvo_obj(xx, a):
        q = bert.dense(xx, a["query"]).reshape(B, S, nh, hd)
        k = bert.dense(xx, a["key"]).reshape(B, S, nh, hd)
        v = bert.dense(xx, a["value"]).reshape(B, S, nh, hd)
        ctx = (q + k + v).reshape(B, S, H)  # stand-in for the kernel
        return jnp.sum(bert.dense(ctx, a["output"]).astype(jnp.float32))

    dt = timed_op(grad_reduce(qkvo_obj, (0, 1)), (x, ap), steps=steps)
    # floor: 12 HxH GEMMs (4 fwd + 8 bwd) at the measured 147-170 TFLOP/s
    gemm = 2 * B * S * H * H
    row("QKVO GEMMs fwd+bwd (12 HxH GEMMs)", dt,
        round(12 * gemm / 160e12 * 1e3, 2))

    # --- sub-block 2: attention kernel VJP (flash)
    q = jax.random.normal(key, (B, S, nh, hd), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, nh, hd), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, nh, hd), jnp.bfloat16)

    def attn_obj(q, k, v):
        ctx = bert.dot_product_attention(q, k, v, bias=None,
                                         deterministic=True, impl="flash")
        return jnp.sum(ctx.astype(jnp.float32))

    dt = timed_op(grad_reduce(attn_obj, (0, 1, 2)), (q, k, v), steps=steps)
    # floor: round-4 measured 3.53 ms incl. the Mosaic small-dot wall;
    # XLA-dot arithmetic floor would be ~1.3 ms but is not realizable
    row("attention kernel VJP (flash, fp32 softmax)", dt,
        None if smoke else 3.53)

    # --- sub-block 3: fused-FFN VJP (recompute custom VJP)
    def ffn_obj(xx, p):
        from stonkgs_tpu.ops.fused_ffn import fused_ffn
        y = fused_ffn(xx, p["intermediate"]["kernel"],
                      p["intermediate"]["bias"], p["output"]["kernel"],
                      p["output"]["bias"], act=bc.hidden_act)
        return jnp.sum(y.astype(jnp.float32))

    if smoke:
        dt, ffn_floor = 0.0, None  # Pallas kernel is TPU-only
        rows.append(("fused-FFN VJP", 0.0, None))
    else:
        dt = timed_op(grad_reduce(ffn_obj, (0, 1)), (x, lp1), steps=steps)
        # floor: 7 GEMMs (2 fwd + 2 recompute + 3 bwd) at 179-202 TFLOP/s
        ffn_floor = round(7 * 2 * B * S * H * bc.intermediate_size
                          / 190e12 * 1e3, 2)
        row("fused-FFN VJP (recompute, 7-GEMM floor)", dt, ffn_floor)

    # --- sub-block 4: 2x residual + LayerNorm VJP
    lnp = ap["output_layer_norm"]

    def ln2_obj(xx, yy, p):
        a = bert.layer_norm(xx + yy, p, bc.layer_norm_eps)
        b = bert.layer_norm(a + yy, p, bc.layer_norm_eps)
        return jnp.sum(b.astype(jnp.float32))

    y2 = jax.random.normal(key, (B, S, H), jnp.bfloat16)
    dt = timed_op(grad_reduce(ln2_obj, (0, 1, 2)), (x, y2, lnp),
                  steps=steps)
    # floor: ~8 HBM passes over (B, S, H) bf16 at 819 GB/s
    row("2x residual+LayerNorm VJP", dt,
        round(8 * B * S * H * 2 / 819e9 * 1e3, 2))

    total = sum(ms for n, ms, _ in rows if not n.startswith("WHOLE"))
    emit("trunk layer accounting: sub-block sum vs whole layer",
         round(total, 2), "ms",
         whole_layer_ms=round(layer_ms, 2),
         residual_ms=round(layer_ms - total, 2),
         x12_ms=round(12 * layer_ms, 1),
         components={n: round(ms, 2) for n, ms, _ in rows})


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--smoke", action="store_true")
    a = ap.parse_args()
    if a.smoke:
        jax.config.update("jax_platforms", "cpu")
    main(a.batch_size, a.steps, a.smoke)
