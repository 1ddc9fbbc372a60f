"""BASELINE config 2: fine-tuning step throughput.

Classification fine-tune of the full-scale STonKGs model (BERT-base trunk,
frozen backbones, pooled->dropout->classifier head) — forward + backward +
AdamW update per step, bf16 compute / fp32 optimizer.

Reference equivalent: HF Trainer with per-device batch 8
(``/root/reference/src/stonkgs/models/stonkgs_finetuning.py:425-450``);
the reference publishes no throughput numbers (BASELINE.md).

Prints ONE JSON line: examples/sec/chip.
"""

import argparse
import sys
from functools import partial
from pathlib import Path

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import (  # noqa: E402
    emit, full_scale_config, init_params, synthetic_batch, timed_train_steps,
)

from stonkgs_tpu.models import stonkgs  # noqa: E402
from stonkgs_tpu.train.optimizer import make_optimizer  # noqa: E402
from stonkgs_tpu.train.pretraining import (  # noqa: E402
    init_train_state, make_train_step,
)


def main(batch_size: int = 32, steps: int = 10, num_labels: int = 10,
         kg_vocab: int = 100_000, remat="auto", attention_impl="auto"):
    from stonkgs_tpu.train.pretraining import resolve_train_impl

    remat, attention_impl = resolve_train_impl(remat, attention_impl)
    cfg = full_scale_config(kg_vocab, num_labels=num_labels)
    params = init_params(cfg)
    tx = make_optimizer(params, learning_rate=5e-5, total_steps=1000)
    state = init_train_state(params, tx)
    step_fn = make_train_step(
        cfg, tx,
        loss_fn=partial(stonkgs.classification_loss, remat=remat,
                        attention_impl=attention_impl),
        compute_dtype=jnp.bfloat16,
    )
    batch = synthetic_batch(cfg, batch_size, with_class_labels=True)

    _, dt = timed_train_steps(step_fn, state, batch, steps=steps)
    emit(
        f"fine-tuning step throughput (stonkgs classification, bf16, "
        f"batch {batch_size}, {num_labels} labels, remat={remat}, "
        f"attention={attention_impl}, kg_vocab {kg_vocab})",
        batch_size / dt, "examples/sec/chip",
        step_ms=round(dt * 1e3, 1),
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--num-labels", type=int, default=10)
    ap.add_argument("--kg-vocab", type=int, default=100_000)
    ap.add_argument("--remat", default="auto",
                    choices=["auto", "none", "full", "attention"])
    ap.add_argument("--attention", default="auto",
                    choices=["auto", "xla", "flash"])
    a = ap.parse_args()
    main(a.batch_size, a.steps, a.num_labels, a.kg_vocab, a.remat,
         a.attention)
