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
import os
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

# shared batch/param builders — one source of truth for the workload layout
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "benchmarks"))
from _util import full_scale_config, init_params, synthetic_batch  # noqa: E402

from stonkgs_tpu.models import stonkgs  # noqa: E402

BASELINE_PAIRS_PER_SEC = 10_000.0


def main(batch_size: int = 128, steps: int = 20, kg_vocab: int = 100_000):
    cfg = full_scale_config(kg_vocab)
    params = init_params(cfg)
    B = batch_size
    batch = jax.device_put(synthetic_batch(cfg, B))

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


def _watchdog(done: threading.Event, timeout_s: float):
    """Emit an error JSON line instead of hanging forever.

    A wedged device tunnel can block inside backend init or the first
    device op, where no Python-level timeout applies. The full benchmark
    normally completes in well under 5 minutes including warm-up.
    """
    if not done.wait(timeout_s):
        print(json.dumps({
            "metric": "embedding extraction throughput (stonkgs)",
            "value": None,
            "unit": "pairs/sec/chip",
            "vs_baseline": None,
            "error": f"no result within {timeout_s:.0f}s — device backend "
                     "unreachable or wedged (not a model regression)",
        }), flush=True)
        os._exit(2)


if __name__ == "__main__":
    _done = threading.Event()
    threading.Thread(
        target=_watchdog,
        args=(_done, float(os.environ.get("STONKGS_BENCH_TIMEOUT_S", 1500))),
        daemon=True).start()
    main()
    _done.set()
