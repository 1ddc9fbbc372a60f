"""Training-step speed-of-light accounting (the extraction treatment).

Round-4 gave extraction a sums-to-the-whole op-level table; this bench
does the same for the pre-training step at the driver config (B=32,
bf16, flash VJP, remat=none — the `bench.py` second metric).  The step
decomposes on the stop_gradient boundary the model actually has
(reference: the frozen LM inside ``stonkgs_model.py:143-147``):

  full step = frozen-embeds fwd           (BioBERT 12L@S256 + KG gather + LN)
            + trunk fwd+bwd               (12L@S512, flash VJP, fused-FFN VJP)
            + heads fwd+bwd               (masked gathers + MLM 28996-way +
                                           ELM 100k-way decoders + NSP, and
                                           d(loss)/d(seq) back into the trunk)
            + optimizer                   (AdamW on the ~134M trainable tree)
            + dispatch/loss residual

Each component is timed STANDALONE at the exact step shapes with fixed
cotangents where a backward is involved, so the rows sum against the
independently-measured full step.  GEMM floors use the round-4 measured
per-shape rates (``bench_peak.py``: qkvo-class GEMMs 147-170 TFLOP/s at
K=768, FFN/decoder-class 179-202).

Prints one JSON line per row plus a summary line.
"""

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import (  # noqa: E402
    emit, full_scale_config, init_params, synthetic_batch, timed_op,
    timed_train_steps,
)

from stonkgs_tpu.models import bert, stonkgs  # noqa: E402
from stonkgs_tpu.models.heads import (  # noqa: E402
    elm_decode_segment, elm_transform, nsp_head,
)
from stonkgs_tpu.ops.losses import (  # noqa: E402
    gather_masked_positions, masked_cross_entropy,
)
from stonkgs_tpu.train.optimizer import (  # noqa: E402
    make_optimizer, split_frozen,
)


def heads_loss(train_params, seq, pooled, batch, cfg):
    """MLM + ELM + NSP from a given trunk sequence output (exact step
    semantics: ``stonkgs.pretraining_loss`` past the trunk)."""
    p = train_params["cls"]["predictions"]
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
        nsp_head(train_params["cls"]["seq_relationship"], pooled, None),
        batch["next_sentence_labels"])
    return mlm + elm + nsp


def main(batch_size: int = 32, steps: int = 20, kg_vocab: int = 100_000,
         smoke: bool = False):
    if smoke:
        # CPU smoke test of the accounting plumbing (tiny shapes; timings
        # meaningless — interpret-mode Pallas)
        from stonkgs_tpu.config import BertConfig, STonKGsConfig

        cfg = STonKGsConfig(
            bert=BertConfig(vocab_size=97, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=64),
            kg_vocab_size=61, text_len=16, entity_len=8)
        batch_size, steps = 2, 1
    else:
        cfg = full_scale_config(kg_vocab)
    params = init_params(cfg)
    batch = synthetic_batch(cfg, batch_size, with_pretraining_labels=True)
    B = batch_size
    rows = []

    def row(name, dt, floor_ms=None):
        ms = dt * 1e3
        rows.append((name, ms, floor_ms))
        emit(f"train accounting: {name} (B={B})", ms, "ms",
             floor_ms=floor_ms)
        return ms

    # --- component 1: frozen embeds forward (backbones + KG gather + LN)
    ef = jax.jit(lambda p, b: stonkgs.backbone_embeddings(
        p, cfg, b["input_ids"], compute_dtype=jnp.bfloat16)[:, 0, :8])
    dt = timed_op(ef, (params, batch), steps=steps)
    # floor: BioBERT 12L fwd GEMMs at S=256 -> 2 * 12L * 12H^2 * tokens
    H = cfg.bert.hidden_size
    tok_b = B * cfg.text_len
    gemm_flops_backbone = 2 * 12 * 12 * H * H * tok_b
    row("frozen embeds fwd (BioBERT 12L@S256 + KG gather + LN)", dt,
        round(gemm_flops_backbone / 160e12 * 1e3, 1))

    embeds = jax.block_until_ready(jax.jit(
        lambda p, b: stonkgs.backbone_embeddings(
            p, cfg, b["input_ids"], compute_dtype=jnp.bfloat16)
    )(params, batch))

    # --- component 2: trunk fwd+bwd (flash VJP, fused-FFN VJP, pooler)
    train_params, frozen = split_frozen(params)

    def trunk_out(tp, e, b):
        seq, pooled = bert.bert_model(
            tp["trunk"], cfg.bert, inputs_embeds=e,
            attention_mask=b["attention_mask"],
            token_type_ids=b["token_type_ids"],
            deterministic=True, compute_dtype=jnp.bfloat16,
            attention_impl="flash", with_pooler=True)
        return seq, pooled

    seq0, pooled0 = jax.jit(trunk_out)(train_params, embeds, batch)
    ct_seq = jax.block_until_ready(jnp.ones_like(seq0))
    ct_pool = jax.block_until_ready(jnp.ones_like(pooled0))

    def trunk_obj(tp, e, b, cs, cp):
        seq, pooled = trunk_out(tp, e, b)
        return (jnp.sum(seq.astype(jnp.float32) * cs)
                + jnp.sum(pooled.astype(jnp.float32) * cp))

    gf = jax.jit(lambda tp, e, b, cs, cp: jax.tree_util.tree_reduce(
        lambda a, g: a + jnp.sum(jnp.abs(g.astype(jnp.float32))),
        jax.grad(trunk_obj)(tp, e, b, cs, cp), jnp.float32(0.0))[None])
    dt = timed_op(gf, (train_params, embeds, batch, ct_seq, ct_pool),
                  steps=steps)
    # floor: 12L fwd+bwd GEMMs at S=512 (3x fwd GEMM cost) + attention dots
    tok_t = B * (cfg.text_len + cfg.entity_len)
    gemm_flops_trunk = 3 * 2 * 12 * 12 * H * H * tok_t
    attn_dots = 3 * 2 * 2 * 12 * B * 512 * 512 * H  # qk+pv fwd+bwd, D=64
    row("trunk fwd+bwd (12L@S512 flash VJP + pooler)", dt,
        round((gemm_flops_trunk / 160e12 + attn_dots / 95e12) * 1e3, 1))

    # --- component 3: heads fwd+bwd incl d(loss)/d(seq)
    hf = jax.jit(lambda tp, s, pl, b: jax.tree_util.tree_reduce(
        lambda a, g: a + jnp.sum(jnp.abs(g.astype(jnp.float32))),
        jax.grad(heads_loss, argnums=(0, 1, 2))(tp, s, pl, b, cfg),
        jnp.float32(0.0))[None])
    dt = timed_op(hf, (train_params, seq0, pooled0, batch), steps=steps)
    k = max(int(cfg.text_len * 0.15), 1)
    dec_flops = 3 * 2 * B * k * H * (cfg.bert.vocab_size + kg_vocab
                                     + 2 * H)  # fwd+bwd GEMMs
    row("heads fwd+bwd (MLM 28996 + ELM 100k decoders, masked gathers, NSP)",
        dt, round(dec_flops / 180e12 * 1e3, 1))

    # --- component 4: optimizer (AdamW on the trainable tree)
    tx = make_optimizer(train_params, learning_rate=1e-4, total_steps=1000)
    opt_state = tx.init(train_params)
    grads = jax.tree.map(lambda p: jnp.ones_like(p), train_params)

    import optax

    def opt_step(os, tp, g):
        updates, os = tx.update(g, os, tp)
        return os, optax.apply_updates(tp, updates)

    of = jax.jit(opt_step)
    dt = timed_op(lambda os, tp, g: jax.tree.leaves(of(os, tp, g)[1])[0]
                  .reshape(-1)[:2], (opt_state, train_params, grads),
                  steps=steps)
    n_train = sum(x.size for x in jax.tree.leaves(train_params))
    tree_bytes = sum(x.nbytes for x in jax.tree.leaves(train_params))
    # floor: AdamW reads p,m,v,g and writes p,m,v -> 7 tree passes
    row(f"optimizer (AdamW, {n_train/1e6:.0f}M trainable params)", dt,
        round(7 * tree_bytes / 819e9 * 1e3, 1))

    # --- the whole step, measured independently
    from stonkgs_tpu.train.pretraining import init_train_state, make_train_step

    state = init_train_state(params, tx)
    step_fn = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16,
                              remat=False, attention_impl="flash",
                              donate=False)
    state, dt = timed_train_steps(step_fn, state, batch, steps=steps)
    full_ms = dt * 1e3
    emit(f"train accounting: FULL STEP (B={B}, flash, remat=none)",
         full_ms, "ms", examples_per_sec=round(B / dt, 1))

    # --- the same step with the unrolled trunk (remat="unroll", the new
    # TPU auto): the layer loop becomes 12 static programs, so the scan's
    # stacked-param dynamic slices and dynamic-update-slice gradient
    # accumulation vanish
    state_u = init_train_state(params, tx)
    step_u = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16,
                             remat="unroll", attention_impl="flash",
                             donate=False)
    state_u, dt_u = timed_train_steps(step_u, state_u, batch, steps=steps)
    emit(f"train accounting: FULL STEP (B={B}, flash, remat=unroll)",
         dt_u * 1e3, "ms", examples_per_sec=round(B / dt_u, 1))

    total = sum(ms for _, ms, _ in rows)
    emit("train accounting: component sum vs full step",
         round(total, 1), "ms",
         full_step_ms=round(full_ms, 1),
         residual_ms=round(full_ms - total, 1),
         components={n: round(ms, 1) for n, ms, _ in rows})


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--kg-vocab", type=int, default=100_000)
    ap.add_argument("--smoke", action="store_true")
    a = ap.parse_args()
    if a.smoke:
        # env JAX_PLATFORMS=cpu is ignored under the axon sitecustomize;
        # only the config knob reliably selects CPU before backend init
        jax.config.update("jax_platforms", "cpu")
    main(a.batch_size, a.steps, a.kg_vocab, a.smoke)
