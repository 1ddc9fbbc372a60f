"""Benchmark: embedding-extraction + pre-training throughput (driver entry).

Measures the two headline numbers on the default JAX backend:
  1. batched ``get_stonkgs_embeddings``-path forward passes (frozen BioBERT
     over the text half + trainable trunk over 512 tokens + pooler),
     full BERT-base scale, bf16 — the north-star workload.  The reference
     extracts embeddings at batch size 1 with per-token Python dict gathers
     (``stonkgs_for_embeddings.py:176-184``).
  2. the full MLM+ELM+NSP pre-training step (B=32, Pallas flash attention,
     selective remat) — the soak-proven configuration from PERF.md.

Wedge-proofing (round-3 lesson: one wedged device tunnel = one lost round
of driver evidence): the measurement runs in a CHILD process.  The parent
first runs a ~seconds-scale backend health probe, retries the measurement
once in a fresh process on failure/timeout, then falls back to a
reduced-scale single-batch measurement, and only then emits an error JSON
that includes the probe diagnosis.

Emits the pre-training JSON line first and the extraction line LAST; the
extraction line also carries ``pretrain_examples_per_sec`` so either
parsing convention captures both numbers.
"""

import argparse
import json
import os
import subprocess
import sys
import time

BASELINE_PAIRS_PER_SEC = 10_000.0  # BASELINE.json north star (v5e-8 target)


# ---------------------------------------------------------------------------
# measurement (child process)
# ---------------------------------------------------------------------------

def measure(batch_size: int = 128, steps: int = 20, kg_vocab: int = 100_000,
            pretrain: bool = True, pretrain_batch: int = 32,
            pretrain_steps: int = 10) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    from _util import (full_scale_config, init_params, synthetic_batch,
                       timed_train_steps)
    from stonkgs_tpu.models import stonkgs
    from stonkgs_tpu.ops.attention import default_infer_impl

    cfg = full_scale_config(kg_vocab)
    params = init_params(cfg)
    B = batch_size
    batch = jax.device_put(synthetic_batch(cfg, B))
    impl = default_infer_impl()

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
            attention_impl=impl,
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

    pretrain_eps = None
    if pretrain:
        from stonkgs_tpu.train.optimizer import make_optimizer
        from stonkgs_tpu.train.pretraining import (
            init_train_state, make_train_step, resolve_train_impl)

        tx = make_optimizer(params, learning_rate=1e-4, total_steps=1000)
        state = init_train_state(params, tx)
        remat, attn = resolve_train_impl("auto", "auto")
        step_fn = make_train_step(
            cfg, tx, compute_dtype=jnp.bfloat16,
            remat=remat, attention_impl=attn,
        )
        tbatch = synthetic_batch(cfg, pretrain_batch,
                                 with_pretraining_labels=True)
        _, tdt = timed_train_steps(step_fn, state, tbatch,
                                   steps=pretrain_steps)
        pretrain_eps = pretrain_batch / tdt
        print(json.dumps({
            "metric": "pre-training throughput (stonkgs MLM+ELM+NSP, bf16, "
                      f"batch {pretrain_batch}, attention={attn}, "
                      f"remat={remat}, kg_vocab {kg_vocab})",
            "value": round(pretrain_eps, 1),
            "unit": "examples/sec/chip",
            "vs_baseline": None,
            "step_ms": round(tdt * 1e3, 1),
        }), flush=True)

    line = {
        "metric": "embedding extraction throughput (stonkgs, bf16, batch "
                  f"{B}, seq 512, kg_vocab {kg_vocab})",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        "single_batch_latency_ms": round(latency_ms, 1),
    }
    if pretrain_eps is not None:
        line["pretrain_examples_per_sec"] = round(pretrain_eps, 1)
    print(json.dumps(line), flush=True)


# ---------------------------------------------------------------------------
# orchestration (parent process)
# ---------------------------------------------------------------------------

_PROBE = ("import jax, numpy as np, jax.numpy as jnp; "
          "d = jax.devices(); "
          "x = jnp.ones((256, 256), jnp.bfloat16); "
          "v = float(jnp.sum((x @ x).astype(jnp.float32))); "
          "assert np.isfinite(v); "
          "print('PROBE_OK', d)")


def _run(cmd, timeout_s):
    """Run a child, forwarding stdout; returns (rc, lines, note)."""
    try:
        p = subprocess.run(
            cmd, timeout=timeout_s, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
    except subprocess.TimeoutExpired as e:
        out = e.output or ""
        return None, out.splitlines(), f"timeout after {timeout_s:.0f}s"
    return p.returncode, (p.stdout or "").splitlines(), None


def _probe(timeout_s: float = 120.0):
    t0 = time.perf_counter()
    rc, lines, note = _run([sys.executable, "-c", _PROBE], timeout_s)
    dt = time.perf_counter() - t0
    ok = rc == 0 and any("PROBE_OK" in ln for ln in lines)
    detail = note or (None if ok else "; ".join(lines[-3:]))
    return ok, dt, detail


def _forward_json(lines) -> bool:
    """Print the child's JSON lines; True if a metric line was found."""
    found = False
    for ln in lines:
        ln = ln.strip()
        if ln.startswith("{") and '"metric"' in ln:
            print(ln, flush=True)
            found = True
    return found


def _error(msg: str) -> None:
    print(json.dumps({
        "metric": "embedding extraction throughput (stonkgs)",
        "value": None,
        "unit": "pairs/sec/chip",
        "vs_baseline": None,
        "error": msg,
    }), flush=True)


def main() -> int:
    me = os.path.abspath(__file__)
    attempt_timeout = float(os.environ.get("STONKGS_BENCH_TIMEOUT_S", 750))

    ok, probe_dt, detail = _probe()
    if not ok:
        # one more probe — transient tunnel hiccups are common
        ok, probe_dt, detail = _probe()
    if not ok:
        _error(f"backend health probe failed twice ({detail}) — device "
               "backend unreachable or wedged (not a model regression)")
        return 2
    print(f"# backend probe ok in {probe_dt:.1f}s", file=sys.stderr)

    base = [sys.executable, me, "--measure"]
    for attempt in (1, 2):
        rc, lines, note = _run(base, attempt_timeout)
        if rc == 0 and _forward_json(lines):
            return 0
        print(f"# attempt {attempt} failed (rc={rc}, {note or 'no metric'})",
              file=sys.stderr)
        for ln in lines[-5:]:
            print(f"#   {ln}", file=sys.stderr)

    # reduced-scale fallback: single small batch, no pretraining step
    rc, lines, note = _run(
        base + ["--batch-size", "16", "--steps", "3", "--no-pretrain"],
        attempt_timeout * 0.6)
    if rc == 0 and _forward_json(lines):
        return 0

    _error("measurement failed after 2 full attempts + reduced-scale "
           f"fallback (last: rc={rc}, {note}); backend probe HAD succeeded "
           f"in {probe_dt:.1f}s — investigate the model path")
    return 2


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="run the measurement in THIS process (child mode)")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--kg-vocab", type=int, default=100_000)
    ap.add_argument("--no-pretrain", action="store_true")
    a = ap.parse_args()
    if a.measure:
        measure(a.batch_size, a.steps, a.kg_vocab,
                pretrain=not a.no_pretrain)
        sys.exit(0)
    sys.exit(main())
