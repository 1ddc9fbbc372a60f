"""ProtSTonKGs end-to-end forward throughput (seq/sec/chip).

Full 710M-param model (frozen BioBERT + frozen 30L ProtBERT + BigBird
trunk at 4096), bf16. Compares the trunk attention options:

  * parity block-sparse, Pallas kernel (default on TPU at eval)
  * parity block-sparse, XLA lowering
  * dense flash ("original_full" — only valid for full-attention models)

VERDICT item 3 target: parity-mode >= the round-1 dense-flash 16.3 seq/s.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import emit, timed_op  # noqa: E402

from stonkgs_tpu.config import ProtSTonKGsConfig  # noqa: E402
from stonkgs_tpu.models import protstonkgs  # noqa: E402
from stonkgs_tpu.ops.bigbird_sparse import build_rand_attn  # noqa: E402
from stonkgs_tpu.utils.init import fast_init  # noqa: E402


def main(batch_size: int = 8, steps: int = 8, kg_vocab: int = 20_000):
    from stonkgs_tpu.config import BigBirdConfig

    cfg = ProtSTonKGsConfig(trunk=BigBirdConfig(), kg_vocab_size=kg_vocab)
    params = fast_init(lambda: protstonkgs.init_protstonkgs_params(
        jax.random.PRNGKey(0), cfg))
    params = jax.device_put(
        jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params))

    rng = np.random.default_rng(0)
    B = batch_size
    text = rng.integers(0, cfg.lm.vocab_size, (B, cfg.text_len))
    ent = rng.integers(0, cfg.kg_table_size, (B, cfg.entity_len))
    prot = rng.integers(0, cfg.prot_vocab_size, (B, cfg.prot_len))
    ids = jnp.asarray(np.concatenate([text, ent, prot], 1), jnp.int32)
    mask = jnp.ones((B, cfg.seq_len), jnp.float32)
    plan = build_rand_attn(
        cfg.seq_len, cfg.trunk.block_size, cfg.trunk.num_random_blocks,
        cfg.trunk.num_attention_heads, cfg.trunk.num_hidden_layers,
        cfg.trunk.max_position_embeddings, training=False)

    variants = [
        ("block-sparse pallas", dict(rand_attn=plan, sparse_impl="pallas")),
        ("block-sparse xla", dict(rand_attn=plan, sparse_impl="xla")),
        ("dense flash", dict(trunk_attention_type="original_full",
                             trunk_attention_impl="flash")),
    ]
    for name, kw in variants:
        def fwd(params, ids, kw=kw):
            _, pooled = protstonkgs.trunk_forward(
                params, cfg, ids, mask,
                deterministic=True, compute_dtype=jnp.bfloat16, **kw)
            return pooled

        dt = timed_op(jax.jit(fwd), (params, ids), steps=steps)
        emit(
            f"ProtSTonKGs end-to-end forward [{name}] (bf16, B={B}, "
            f"seq 4096, kg_vocab {kg_vocab})",
            B / dt, "seq/sec/chip",
            forward_ms=round(dt * 1e3, 1),
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--kg-vocab", type=int, default=20_000)
    a = ap.parse_args()
    main(a.batch_size, a.steps, a.kg_vocab)
