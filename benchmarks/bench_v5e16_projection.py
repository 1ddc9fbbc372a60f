"""BASELINE config 5: v5e-16 data-parallel pre-training projection.

Only one v5e chip is reachable in this environment, so the 16-chip number
is a PROJECTION from measured ICI-free quantities:

  * measured single-chip step time at per-chip batch B (real hardware),
  * the DP gradient all-reduce volume = trainable-parameter bytes (fp32
    grads; the frozen LM backbone and KG table contribute none — and the
    model-axis-sharded decoders would shrink this further),
  * a ring all-reduce cost model over the v5e 4x4 2D torus:
    t_ar = 2 * V * (n-1)/n / BW_chip, with BW_chip defaulting to 1.8e11
    B/s (4 ICI links/chip x 45 GB/s one-way, scaling-book v5e numbers).

Reported: conservative (no compute/comm overlap) and overlapped bounds.

Prints ONE JSON line: projected examples/sec on v5e-16.
"""

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import (  # noqa: E402
    emit, full_scale_config, init_params, synthetic_batch, timed_train_steps,
)

from stonkgs_tpu.train.optimizer import make_optimizer  # noqa: E402
from stonkgs_tpu.train.pretraining import (  # noqa: E402
    init_train_state, make_train_step,
)

FROZEN_SUBTREES = ("lm_backbone", "kg_backbone")


def trainable_grad_bytes(params) -> int:
    total = 0
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        keys = [str(getattr(k, "key", k)) for k in path]
        if any(k in FROZEN_SUBTREES for k in keys):
            continue
        total += int(np.prod(leaf.shape)) * 4  # fp32 gradients
    return total


def decoder_grad_bytes(params) -> int:
    """fp32 bytes of the vocab-dim decoder kernels (TP-shardable)."""
    total = 0
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        keys = [str(getattr(k, "key", k)) for k in path]
        if any("decoder" in k for k in keys):
            total += int(np.prod(leaf.shape)) * 4
    return total


def main(batch_size: int = 64, steps: int = 10, kg_vocab: int = 100_000,
         n_chips: int = 16, bw_chip: float = 1.8e11, tp: int = 1):
    """DP (tp=1) or DPxTP (tp=k) projection from the measured step.

    With tensor parallelism over the model axis (``parallel.tp``):
      * the decoder kernels (and their grads/moments) are vocab-sharded,
        so their DP all-reduce volume drops by 1/tp and rides the smaller
        dp = n/tp ring;
      * the TP gather adds one bf16 (B, entity_len, H) psum per
        micro-batch over the tp ring (forward only — the KG table is
        frozen, so the transpose contributes no backward collective);
      * the TP decode's lse/target psums are (B, K) scalars — negligible.
    Per-chip compute is taken as the measured single-chip step
    (conservative: the decoder matmuls actually shrink by 1/tp).
    """
    cfg = full_scale_config(kg_vocab)
    params = init_params(cfg)
    grad_bytes = trainable_grad_bytes(params)

    from stonkgs_tpu.train.pretraining import resolve_train_impl

    remat, attention_impl = resolve_train_impl()
    tx = make_optimizer(params, learning_rate=1e-4, total_steps=1000)
    state = init_train_state(params, tx)
    step_fn = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16,
                              remat=remat, attention_impl=attention_impl)
    batch = synthetic_batch(cfg, batch_size, with_pretraining_labels=True)
    _, dt = timed_train_steps(step_fn, state, batch, steps=steps)

    def ring(vol_bytes, n):
        return 0.0 if n <= 1 else 2.0 * vol_bytes * (n - 1) / n / bw_chip

    if tp <= 1:
        t_comm = ring(grad_bytes, n_chips)
        mode = "DP"
        detail = (f"grad all-reduce {grad_bytes / 1e6:.0f} MB -> "
                  f"{t_comm * 1e3:.1f} ms model")
    else:
        dp = n_chips // tp
        dec_bytes = decoder_grad_bytes(params)
        dense_bytes = grad_bytes - dec_bytes
        t_dp = ring(dense_bytes + dec_bytes / tp, dp)
        gather_psum = batch_size * cfg.entity_len * cfg.bert.hidden_size * 2
        t_tp = ring(gather_psum, tp)
        t_comm = t_dp + t_tp
        mode = f"DP{dp}xTP{tp}"
        detail = (f"dp all-reduce {(dense_bytes + dec_bytes / tp) / 1e6:.0f}"
                  f" MB -> {t_dp * 1e3:.1f} ms + tp gather psum "
                  f"{gather_psum / 1e6:.1f} MB -> {t_tp * 1e3:.2f} ms")

    ex_s_conservative = n_chips * batch_size / (dt + t_comm)
    ex_s_overlapped = n_chips * batch_size / max(dt, t_comm)

    emit(
        f"projected v5e-{n_chips} pre-training throughput ({mode}, per-chip "
        f"batch {batch_size}, measured step {dt * 1e3:.0f} ms, {detail})",
        ex_s_conservative, "examples/sec (projected)",
        overlapped_bound=round(ex_s_overlapped, 1),
        single_chip_examples_per_sec=round(batch_size / dt, 1),
        scaling_efficiency=round(dt / (dt + t_comm), 4),
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--kg-vocab", type=int, default=100_000)
    ap.add_argument("--chips", type=int, default=16)
    ap.add_argument("--bw-chip", type=float, default=1.8e11)
    ap.add_argument("--tp", type=int, default=1,
                    help="model-axis size for a DPxTP projection")
    a = ap.parse_args()
    main(a.batch_size, a.steps, a.kg_vocab, a.chips, a.bw_chip, a.tp)
