"""Shared helpers for the BASELINE-config benchmarks.

Honest timing on the tunneled axon TPU backend (see PERF.md): params are
jit ARGUMENTS (never closed over), every timed step ends in a device->host
scalar fetch (``block_until_ready`` returns early on axon), and reductions
cover the full batch so XLA cannot dead-code-eliminate rows.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

# make `stonkgs_tpu` importable when run as `python benchmarks/bench_*.py`
_ROOT = str(Path(__file__).resolve().parent.parent)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np

import jax
import jax.numpy as jnp

# persistent compilation cache: XLA compiles of the full-scale models take
# minutes on a small host CPU; caching them makes re-runs near-instant
# (opt out with STONKGS_NO_COMPILE_CACHE=1)
import os

if not os.environ.get("STONKGS_NO_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stonkgs_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.utils.init import fast_init


def full_scale_config(kg_vocab: int = 100_000, num_labels=None) -> STonKGsConfig:
    """BERT-base STonKGs (12L/768h/28996 vocab, 256+256)."""
    return STonKGsConfig(bert=BertConfig(), kg_vocab_size=kg_vocab,
                         num_labels=num_labels)


def init_params(cfg: STonKGsConfig, dtype=jnp.bfloat16, seed: int = 0):
    params = fast_init(
        lambda: stonkgs.init_stonkgs_params(
            jax.random.PRNGKey(seed), cfg,
            with_classifier=cfg.num_labels is not None,
        )
    )
    return jax.device_put(jax.tree.map(lambda x: jnp.asarray(x, dtype), params))


def synthetic_batch(cfg: STonKGsConfig, batch_size: int, *, seed: int = 0,
                    with_pretraining_labels: bool = False,
                    with_class_labels: bool = False):
    rng = np.random.default_rng(seed)
    B = batch_size
    text = rng.integers(0, cfg.bert.vocab_size, (B, cfg.text_len))
    ent = rng.integers(0, cfg.kg_vocab_size, (B, cfg.entity_len))
    batch = {
        "input_ids": np.concatenate([text, ent], 1).astype(np.int32),
        "attention_mask": np.ones((B, cfg.seq_len), np.int32),
        "token_type_ids": np.concatenate(
            [np.zeros((B, cfg.text_len), np.int32),
             np.ones((B, cfg.entity_len), np.int32)], 1),
    }
    if with_pretraining_labels:
        # exactly int(0.15 * len) masked positions per half, like the
        # reference preprocessing (indra_for_pretraining.py:55-58)
        k_text = int(cfg.text_len * 0.15)
        k_ent = int(cfg.entity_len * 0.15)
        mlm = np.full((B, cfg.text_len), -100, np.int64)
        elm = np.full((B, cfg.entity_len), -100, np.int64)
        for i in range(B):
            mlm[i, rng.choice(cfg.text_len, k_text, replace=False)] = (
                rng.integers(0, cfg.bert.vocab_size, k_text))
            elm[i, rng.choice(cfg.entity_len, k_ent, replace=False)] = (
                rng.integers(0, cfg.kg_vocab_size, k_ent))
        batch["masked_lm_labels"] = mlm
        batch["ent_masked_lm_labels"] = elm
        batch["next_sentence_labels"] = rng.integers(0, 2, (B,)).astype(np.int64)
    if with_class_labels:
        batch["labels"] = rng.integers(0, cfg.num_labels, (B,)).astype(np.int64)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def timed_train_steps(step_fn, state, batch, *, steps: int, warmup: int = 3):
    """Run ``steps`` train steps; sync once at the end.

    Steps chain through ``state`` (a real data dependency), so the device
    executes them back to back; the single final loss fetch (a true
    device->host sync on the tunneled axon backend) covers the whole chain
    — per-step fetches would add one ~25 ms tunnel round trip per step.
    Returns (final_state, seconds_per_step)."""
    if warmup < 1:
        raise ValueError("warmup must be >= 1 (the first step compiles)")
    for _ in range(warmup):
        state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(loss), loss
    return state, dt


def timed_op(fn, args, *, steps: int, warmup: int = 2):
    """Time a jitted op by queueing ``steps`` dispatches and syncing once.

    The device executes enqueued programs in order, so fetching a scalar
    derived from the LAST output waits for all of them; per-step host
    round trips (~25 ms over the axon tunnel) stay out of the measurement.
    ``fn`` must return an array; finiteness is checked on the last one."""
    import jax.numpy as jnp

    if warmup < 1:
        raise ValueError("warmup must be >= 1 (the first call compiles)")
    reduce = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    for _ in range(warmup):
        out = fn(*args)
    assert np.isfinite(float(reduce(out)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    total = float(reduce(out))
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(total)
    return dt


def emit(metric: str, value: float, unit: str, baseline=None, **extra):
    line = {"metric": metric, "value": round(float(value), 2), "unit": unit,
            "vs_baseline": (round(float(value) / baseline, 4)
                            if baseline else None)}
    line.update(extra)
    print(json.dumps(line))
    return line
