"""Block-sparse BigBird attention: Pallas kernel vs XLA lowering on TPU.

Measures (a) the attention op alone at ProtSTonKGs trunk shape
(B, 12 heads, 4096, 64) and (b) the full parity-mode ProtSTonKGs-trunk
BigBird forward (12 layers), both bf16. Round-1 state: XLA block-sparse at
~16% MXU, beaten by dense flash (16.3 seq/s) — the Pallas kernel must win
back the 8x FLOP advantage of sparsity (VERDICT item 3).

Prints one JSON line per measurement.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import emit, timed_op  # noqa: E402

from stonkgs_tpu.config import BigBirdConfig  # noqa: E402
from stonkgs_tpu.models import bigbird  # noqa: E402
from stonkgs_tpu.ops.bigbird_sparse import (  # noqa: E402
    block_sparse_attention, build_rand_attn,
)
from stonkgs_tpu.ops.bigbird_sparse_pallas import (  # noqa: E402
    block_sparse_attention_pallas,
)
from stonkgs_tpu.utils.init import fast_init  # noqa: E402


def bench_attention_op(B: int, steps: int, training_plan: bool):
    H, S, D, bs, r = 12, 4096, 64, 64, 3
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
        for _ in range(3)
    )
    mask = jnp.ones((B, S), jnp.float32)
    plan = build_rand_attn(S, bs, r, H, 1, 4096, training=training_plan)[0]
    plan = jnp.asarray(plan)

    for name, fn in [("xla", block_sparse_attention),
                     ("pallas", block_sparse_attention_pallas)]:
        # mask/plan as ARGUMENTS: closed-over arrays would be baked into
        # the HLO as constants and their masking work constant-folded away
        f = jax.jit(lambda q, k, v, plan, mask, fn=fn: fn(q, k, v, plan, mask, bs))
        dt = timed_op(f, (q, k, v, plan, mask), steps=steps)
        flops = 2 * 2 * B * H * (S - 2 * bs) * (5 + r) * bs * D \
            + 2 * 2 * B * H * 2 * bs * S * D
        emit(
            f"block-sparse attention op ({name}, bf16, B={B}, 12x4096x64, "
            f"{'train' if training_plan else 'eval'} plan)",
            B / dt, "seq/sec",
            op_ms=round(dt * 1e3, 2),
            tflops=round(flops / dt / 1e12, 2),
        )


def bench_trunk_forward(B: int, steps: int):
    cfg = BigBirdConfig()  # bigbird-roberta-base, block_sparse
    params = fast_init(lambda: bigbird.init_bigbird_params(
        jax.random.PRNGKey(0), cfg))
    params = jax.device_put(
        jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params))
    rng = np.random.default_rng(0)
    S = 4096
    embeds = jnp.asarray(
        rng.normal(size=(B, S, cfg.hidden_size)) * 0.1, jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.float32)
    plan = build_rand_attn(
        S, cfg.block_size, cfg.num_random_blocks, cfg.num_attention_heads,
        cfg.num_hidden_layers, cfg.max_position_embeddings, training=False)

    for impl in ("xla", "pallas"):
        def fwd(params, embeds, mask, impl=impl):
            seq, _ = bigbird.bigbird_model(
                params, cfg, inputs_embeds=embeds, attention_mask=mask,
                deterministic=True, compute_dtype=jnp.bfloat16,
                rand_attn=plan, with_pooler=False, sparse_impl=impl,
            )
            return jnp.sum(seq.astype(jnp.float32), axis=(0, 1))[:1]

        f = jax.jit(fwd)
        dt = timed_op(f, (params, embeds, mask), steps=steps)
        emit(
            f"BigBird trunk forward, parity block-sparse ({impl}, bf16, "
            f"B={B}, 12L, seq 4096)",
            B / dt, "seq/sec",
            forward_ms=round(dt * 1e3, 1),
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    a = ap.parse_args()
    bench_attention_op(a.batch_size, a.steps, training_plan=False)
    bench_attention_op(a.batch_size, a.steps, training_plan=True)
    bench_trunk_forward(a.batch_size, a.steps)
