"""Training-step time breakdown (VERDICT item 5: publish a training
roofline / prove where the step time goes).

Ablates the full-scale STonKGs pre-training step at per-chip batch B:

  * fwd          — loss forward only
  * grad         — value_and_grad, no optimizer update
  * step         — full train step (grad + AdamW update)
  * grad_nofrozen— grad with the frozen-backbone pass replaced by
                   precomputed embeddings (isolates the frozen BioBERT fwd)
  * grad_nsponly — grad with MLM/ELM decoders removed (isolates heads)

All timings queue-dispatch with a single final sync (see _util.timed_op).

Prints one JSON line per ablation.
"""

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import (  # noqa: E402
    emit, full_scale_config, init_params, synthetic_batch, timed_op,
)

from stonkgs_tpu.models import stonkgs  # noqa: E402
from stonkgs_tpu.models.heads import nsp_head  # noqa: E402
from stonkgs_tpu.ops.losses import masked_cross_entropy  # noqa: E402
from stonkgs_tpu.train.optimizer import make_optimizer  # noqa: E402
from stonkgs_tpu.train.pretraining import (  # noqa: E402
    init_train_state, make_train_step,
)


def main(batch_size: int = 64, steps: int = 8, kg_vocab: int = 100_000,
         remat="full", attention_impl="xla"):
    cfg = full_scale_config(kg_vocab)
    params = init_params(cfg)
    batch = synthetic_batch(cfg, batch_size, with_pretraining_labels=True)

    def loss_fn(params, batch):
        loss, _ = stonkgs.pretraining_loss(
            params, cfg, batch, deterministic=True,
            compute_dtype=jnp.bfloat16, remat=remat,
            attention_impl=attention_impl)
        return loss

    # 1. forward only
    dt = timed_op(jax.jit(lambda p, b: loss_fn(p, b)[None]), (params, batch),
                  steps=steps)
    emit(f"train breakdown: fwd only (B={batch_size}, remat={remat}, attn={attention_impl})",
         batch_size / dt, "examples/sec", ms=round(dt * 1e3, 1))

    # 2. grad, no optimizer. Reduce over ALL gradient leaves — returning a
    # single leaf lets XLA dead-code-eliminate the rest of the backward.
    def _gradsum(grads):
        return jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.abs(g.astype(jnp.float32))),
            grads, jnp.float32(0.0))[None]

    gf = jax.jit(lambda p, b: _gradsum(jax.grad(loss_fn)(p, b)))
    dt = timed_op(gf, (params, batch), steps=steps)
    emit(f"train breakdown: fwd+bwd (B={batch_size}, remat={remat}, attn={attention_impl})",
         batch_size / dt, "examples/sec", ms=round(dt * 1e3, 1))

    # 3. full step
    tx = make_optimizer(params, learning_rate=1e-4, total_steps=1000)
    state = init_train_state(params, tx)
    # donate=False: the step must not consume `params`, which the later
    # ablations reuse (donation deleted the buffers -> "Array has been
    # deleted" on the first run of this script)
    step_fn = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16,
                              remat=remat, attention_impl=attention_impl,
                              donate=False)
    from _util import timed_train_steps

    state, dt = timed_train_steps(step_fn, state, batch, steps=steps)
    emit(f"train breakdown: full step (B={batch_size}, remat={remat}, attn={attention_impl})",
         batch_size / dt, "examples/sec", ms=round(dt * 1e3, 1))
    del state, step_fn, tx

    # 4. grad with frozen backbones ablated (precomputed input embeddings)
    embeds = stonkgs.backbone_embeddings(
        params, cfg, batch["input_ids"], compute_dtype=jnp.bfloat16)
    embeds = jax.block_until_ready(embeds)

    def loss_nofrozen(params, embeds, batch):
        from stonkgs_tpu.models import bert

        seq, pooled = bert.bert_model(
            params["trunk"], cfg.bert, inputs_embeds=embeds,
            attention_mask=batch["attention_mask"],
            token_type_ids=batch["token_type_ids"],
            deterministic=True, compute_dtype=jnp.bfloat16,
            remat=remat, attention_impl=attention_impl, with_pooler=True)
        p = params["cls"]["predictions"]
        from stonkgs_tpu.models.heads import elm_decode_segment, elm_transform
        from stonkgs_tpu.ops.losses import gather_masked_positions

        k = max(int(cfg.text_len * 0.15), 1)
        th, tl, _ = gather_masked_positions(
            seq[:, : cfg.text_len], batch["masked_lm_labels"], k)
        eh, el, _ = gather_masked_positions(
            seq[:, cfg.text_len:], batch["ent_masked_lm_labels"], k)
        mlm = masked_cross_entropy(
            elm_decode_segment(p, elm_transform(p, th, cfg.bert, None),
                               "text", None)[..., : cfg.bert.vocab_size], tl)
        elm = masked_cross_entropy(
            elm_decode_segment(p, elm_transform(p, eh, cfg.bert, None),
                               "entity", None)[..., : cfg.kg_vocab_size], el)
        nsp = masked_cross_entropy(
            nsp_head(params["cls"]["seq_relationship"], pooled, None),
            batch["next_sentence_labels"])
        return mlm + elm + nsp

    gf = jax.jit(lambda p, e, b: _gradsum(jax.grad(loss_nofrozen)(p, e, b)))
    dt = timed_op(gf, (params, embeds, batch), steps=steps)
    emit(f"train breakdown: fwd+bwd minus frozen backbones (B={batch_size}, "
         f"remat={remat}, attn={attention_impl})",
         batch_size / dt, "examples/sec", ms=round(dt * 1e3, 1))

    # 5. grad with the MLM/ELM decoders ablated (NSP-only loss)
    def loss_nsp(params, batch):
        _, pooled = stonkgs.trunk_forward(
            params, cfg, batch["input_ids"], batch["attention_mask"],
            batch["token_type_ids"], deterministic=True,
            compute_dtype=jnp.bfloat16, remat=remat,
            attention_impl=attention_impl)
        return masked_cross_entropy(
            nsp_head(params["cls"]["seq_relationship"], pooled, None),
            batch["next_sentence_labels"])

    gf = jax.jit(lambda p, b: _gradsum(jax.grad(loss_nsp)(p, b)))
    dt = timed_op(gf, (params, batch), steps=steps)
    emit(f"train breakdown: fwd+bwd minus MLM/ELM heads (B={batch_size}, "
         f"remat={remat}, attn={attention_impl})",
         batch_size / dt, "examples/sec", ms=round(dt * 1e3, 1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--kg-vocab", type=int, default=100_000)
    ap.add_argument("--remat", default="full",
                    choices=["none", "full", "attention"])
    ap.add_argument("--attention", default="xla", choices=["xla", "flash"])
    a = ap.parse_args()
    main(a.batch_size, a.steps, a.kg_vocab,
         False if a.remat == "none" else a.remat, a.attention)
