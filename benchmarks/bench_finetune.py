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


def prot(batch_size: int = 2, steps: int = 4, num_labels: int = 10,
         kg_vocab: int = 20_000, remat: str = "full",
         sparse_impl: str = "pallas"):
    """ProtSTonKGs classification fine-tune step (VERDICT r2 #8).

    Full 710M model, frozen backbones, BigBird trunk at 4096 with the
    block-sparse custom VJP; forward + backward + AdamW per step.
    Reference: ``/root/reference/src/stonkgs/models/protstonkgs_finetuning.py``
    (per-device batch 2, no published throughput)."""
    import jax
    import numpy as np

    from stonkgs_tpu.config import BigBirdConfig, ProtSTonKGsConfig
    from stonkgs_tpu.models import protstonkgs
    from stonkgs_tpu.ops.bigbird_sparse import build_rand_attn
    from stonkgs_tpu.utils.init import fast_init

    cfg = ProtSTonKGsConfig(trunk=BigBirdConfig(), kg_vocab_size=kg_vocab,
                            num_labels=num_labels)
    params = fast_init(lambda: protstonkgs.init_protstonkgs_params(
        jax.random.PRNGKey(0), cfg, with_classifier=True))
    for key in ("lm_backbone", "prot_backbone", "kg_backbone"):
        params[key] = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16), params[key])
    plan = build_rand_attn(
        cfg.seq_len, cfg.trunk.block_size, cfg.trunk.num_random_blocks,
        cfg.trunk.num_attention_heads, cfg.trunk.num_hidden_layers,
        cfg.trunk.max_position_embeddings, training=True)
    remat_val = {"full": True, "attention": "attention", "none": False}[remat]
    loss_fn = partial(protstonkgs.classification_loss, remat=remat_val,
                      rand_attn=plan, sparse_impl=sparse_impl)
    tx = make_optimizer(params, learning_rate=5e-5, total_steps=1000)
    state = init_train_state(params, tx)
    step_fn = make_train_step(cfg, tx, loss_fn=loss_fn,
                              compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    B = batch_size
    text = rng.integers(0, cfg.lm.vocab_size, (B, cfg.text_len))
    ent = rng.integers(0, cfg.kg_table_size, (B, cfg.entity_len))
    prot_ids = rng.integers(0, cfg.prot_vocab_size, (B, cfg.prot_len))
    batch = {
        "input_ids": jnp.asarray(np.concatenate([text, ent, prot_ids], 1)),
        "attention_mask": jnp.ones((B, cfg.seq_len), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, num_labels, (B,))),
    }
    _, dt = timed_train_steps(step_fn, state, batch, steps=steps, warmup=2)
    emit(
        f"ProtSTonKGs fine-tuning step (classification, bf16, B={B}, "
        f"seq 4096, {num_labels} labels, remat={remat}, block-sparse "
        f"{sparse_impl}, kg_vocab {kg_vocab})",
        B / dt, "seq/sec/chip", step_ms=round(dt * 1e3, 1),
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
    ap.add_argument("--variant", default="stonkgs",
                    choices=["stonkgs", "prot"])
    a = ap.parse_args()
    if a.variant == "prot":
        prot(a.batch_size if a.batch_size != 32 else 2, a.steps,
             a.num_labels, min(a.kg_vocab, 20_000),
             a.remat if a.remat in ("full", "attention", "none") else "full")
    else:
        main(a.batch_size, a.steps, a.num_labels, a.kg_vocab, a.remat,
             a.attention)
