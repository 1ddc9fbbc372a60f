"""Opt-in int8 inference mode: embedding-extraction throughput + fidelity.

Quantizes every eligible dense kernel (``ops/quantization.py``: int8
weights with per-out-channel scales, dynamic per-row activation absmax)
and measures the pooler forward against the bf16 production path, plus
cosine fidelity of the pooled embeddings.

Prints one JSON line per mode.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import (  # noqa: E402
    emit, full_scale_config, init_params, synthetic_batch, timed_op,
)

from stonkgs_tpu.models import stonkgs  # noqa: E402
from stonkgs_tpu.ops.quantization import quantize_params  # noqa: E402

NORTH_STAR = 10_000.0


def main(batch_size: int = 128, steps: int = 20, kg_vocab: int = 100_000):
    cfg = full_scale_config(kg_vocab)
    params = init_params(cfg)
    params_q = quantize_params(params)
    batch = synthetic_batch(cfg, batch_size)

    def fwd(params, batch):
        return stonkgs.pooler_output(params, cfg, batch,
                                     compute_dtype=jnp.bfloat16)

    f = jax.jit(fwd)
    ref = np.asarray(f(params, batch), np.float32)
    got = np.asarray(f(params_q, batch), np.float32)
    cos = float(np.mean(
        np.sum(ref * got, -1)
        / (np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))))

    for name, p in [("bf16", params), ("int8", params_q)]:
        dt = timed_op(f, (p, batch), steps=steps)
        emit(
            f"embedding extraction [{name}] (batch {batch_size}, seq 512, "
            f"kg_vocab {kg_vocab})",
            batch_size / dt, "pairs/sec/chip", baseline=NORTH_STAR,
            batch_ms=round(dt * 1e3, 1),
            **({"cosine_vs_bf16": round(cos, 5)} if name == "int8" else {}),
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--kg-vocab", type=int, default=100_000)
    a = ap.parse_args()
    main(a.batch_size, a.steps, a.kg_vocab)
