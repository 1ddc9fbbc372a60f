"""Benchmark: embedding-extraction throughput (the north-star workload).

Measures batched ``get_stonkgs_embeddings``-path forward passes (frozen
BioBERT over the text half + trainable trunk over 512 tokens + pooler) on
the default JAX backend, full BERT-base scale, bf16.

Baseline: 10,000 text-triple pairs/sec/chip (BASELINE.json north star).
The reference implementation extracts embeddings at batch size 1 with
per-token Python dict gathers (``stonkgs_for_embeddings.py:176-184``).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/sec/chip", "vs_baseline": N}
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.utils.init import fast_init

BASELINE_PAIRS_PER_SEC = 10_000.0


def main(batch_size: int = 128, steps: int = 20, kg_vocab: int = 100_000):
    cfg = STonKGsConfig(bert=BertConfig(), kg_vocab_size=kg_vocab)
    params = fast_init(
        lambda: stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), cfg)
    )
    params = jax.device_put(
        jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    )

    rng = np.random.default_rng(0)
    B = batch_size
    text = rng.integers(0, cfg.bert.vocab_size, (B, cfg.text_len))
    ent = rng.integers(0, cfg.kg_vocab_size, (B, cfg.entity_len))
    batch = {
        "input_ids": jnp.asarray(np.concatenate([text, ent], 1), jnp.int32),
        "attention_mask": jnp.ones((B, cfg.seq_len), jnp.int32),
        "token_type_ids": jnp.asarray(np.concatenate(
            [np.zeros((B, cfg.text_len), np.int32),
             np.ones((B, cfg.entity_len), np.int32)], 1)),
    }
    batch = jax.device_put(batch)

    @jax.jit
    def step(params, batch, i):
        # params must be an ARGUMENT (closed-over arrays would be baked
        # into the HLO as constants). The step index perturbs the input so
        # no two dispatches are identical computations.
        ids = batch["input_ids"].at[:, 0].add(i % 7)
        # the full pooled output is the real product of this workload; it
        # is fetched to the host below (a true sync on the axon tunnel,
        # where block_until_ready returns early)
        return stonkgs.pooler_output(
            params, cfg,
            {**batch, "input_ids": ids},
            compute_dtype=jnp.bfloat16,
        )

    out = step(params, batch, 0)
    np.asarray(out)  # compile + warmup; force a real host round trip

    # Steady-state throughput: dispatch all batches (device executes them
    # back to back without a host round trip between steps — exactly how
    # the streaming extraction engine drives the chip), then fetch every
    # output to the host. Total wall time covers ALL compute + transfers.
    t0 = time.perf_counter()
    outs = [step(params, batch, i) for i in range(1, steps + 1)]
    outs = [np.asarray(o, np.float32) for o in outs]
    dt = (time.perf_counter() - t0) / steps
    for o in outs:
        assert np.isfinite(o).all()

    # Latency: per-batch time with a forced host sync every step.
    t0 = time.perf_counter()
    for i in range(3):
        np.asarray(step(params, batch, i))
    latency_ms = (time.perf_counter() - t0) / 3 * 1e3

    pairs_per_sec = B / dt
    print(json.dumps({
        "metric": "embedding extraction throughput (stonkgs, bf16, batch "
                  f"{B}, seq 512, kg_vocab {kg_vocab})",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        "single_batch_latency_ms": round(latency_ms, 1),
    }))


if __name__ == "__main__":
    main()
