"""Trunk fwd+bwd: lax.scan vs Python-unrolled layer loop.

`bench_trunk_layer_accounting.py` measures ONE standalone layer fwd+bwd
at 9.8 ms (x12 = 117.6) vs the scanned trunk component's 139.4 ms — a
~22 ms delta that LOOKS like scan overhead (stacked-param dynamic
slices + dynamic-update-slice gradient accumulation).  But the full
pre-training step under remat="unroll" measures the SAME as remat=none,
so this bench times the exact trunk component of
`bench_train_accounting.py` under both modes to localize where the
delta really lives: if unroll ~= scan here, the 12x-standalone-layer
figure is not a realizable trunk floor (the unrolled backward still
materializes grads into the stacked (L, ...) buffers, one scatter per
layer, and the standalone layer pays neither that nor the cross-layer
cotangent chain).

Prints one JSON line per mode.
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

from stonkgs_tpu.models import bert, stonkgs  # noqa: E402
from stonkgs_tpu.train.optimizer import split_frozen  # noqa: E402


def main(batch_size: int = 32, steps: int = 20, smoke: bool = False):
    if smoke:
        from stonkgs_tpu.config import BertConfig, STonKGsConfig

        cfg = STonKGsConfig(
            bert=BertConfig(vocab_size=97, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=64),
            kg_vocab_size=61, text_len=16, entity_len=8)
        batch_size, steps = 2, 1
        impl = "xla"
    else:
        cfg = full_scale_config()
        impl = "flash"
    B = batch_size
    params = init_params(cfg)
    batch = synthetic_batch(cfg, B, with_pretraining_labels=True)
    embeds = jax.block_until_ready(jax.jit(
        lambda p, b: stonkgs.backbone_embeddings(
            p, cfg, b["input_ids"], compute_dtype=jnp.bfloat16)
    )(params, batch))
    train_params, _ = split_frozen(params)

    def trunk_out(tp, e, b, remat):
        return bert.bert_model(
            tp["trunk"], cfg.bert, inputs_embeds=e,
            attention_mask=b["attention_mask"],
            token_type_ids=b["token_type_ids"],
            deterministic=True, compute_dtype=jnp.bfloat16,
            attention_impl=impl, with_pooler=True, remat=remat)

    seq0, pooled0 = jax.jit(
        lambda tp, e, b: trunk_out(tp, e, b, False))(train_params,
                                                     embeds, batch)
    ct_seq = jax.block_until_ready(jnp.ones_like(seq0))
    ct_pool = jax.block_until_ready(jnp.ones_like(pooled0))

    for mode in (False, "unroll"):
        def obj(tp, e, b, cs, cp, _mode=mode):
            seq, pooled = trunk_out(tp, e, b, _mode)
            return (jnp.sum(seq.astype(jnp.float32) * cs)
                    + jnp.sum(pooled.astype(jnp.float32) * cp))

        gf = jax.jit(lambda tp, e, b, cs, cp, _o=obj: jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.abs(g.astype(jnp.float32))),
            jax.grad(_o)(tp, e, b, cs, cp), jnp.float32(0.0))[None])
        dt = timed_op(gf, (train_params, embeds, batch, ct_seq, ct_pool),
                      steps=steps)
        emit(f"trunk fwd+bwd (12L@S512, remat={'unroll' if mode else 'none'},"
             f" B={B})", round(dt * 1e3, 2), "ms")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--smoke", action="store_true")
    a = ap.parse_args()
    if a.smoke:
        jax.config.update("jax_platforms", "cpu")
    main(a.batch_size, a.steps, a.smoke)
