"""Small-batch serving latency: the reference's real interactive usage.

The reference's serving paths are latency-shaped, not throughput-shaped:
the README 3-row example and the EMMAA curation flow call ``infer_*`` on
a handful of statements at a time (reference ``api.py:318-336`` even
loops per row).  This bench measures the engine's end-to-end request
latency — features in, class probabilities out, REAL sync per request —
at B=1 and B=8, in parity mode and in the length-bucketed speed mode
(a realistic short request compiles at backbone width 64 / trunk 320).

Each request is timed individually (median + p90 over ``--requests``),
unlike the throughput benches which queue dispatches and sync once.  On
this harness every fetch crosses the axon tunnel (~25 ms RTT floor);
the reported ``device_ms`` estimate (batch time from the queued-dispatch
throughput mode) separates chip compute from harness tax.

Usage: python benchmarks/bench_serving_latency.py [--requests 30]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from _util import emit, full_scale_config, init_params

from stonkgs_tpu.api.inference import STonKGsEngine

from bench_bucketed_extract import corpus_features


def measure_latency(engine, feats, n_requests: int, b: int):
    """Median/p90 per-request latency of predict_proba at batch b."""
    n = len(feats["input_ids"])
    sub = {k: v[:b] for k, v in feats.items()}
    engine.predict_proba(sub)  # compile + warmup
    times = []
    for i in range(n_requests):
        lo = (i * b) % max(n - b, 1)
        req = {k: v[lo: lo + b] for k, v in feats.items()}
        t0 = time.perf_counter()
        out = engine.predict_proba(req)
        times.append(time.perf_counter() - t0)
        assert np.isfinite(out).all()
    times = np.asarray(times) * 1e3
    return float(np.median(times)), float(np.percentile(times, 90))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=30)
    ap.add_argument("--kg-vocab", type=int, default=100_000)
    a = ap.parse_args()

    cfg = full_scale_config(a.kg_vocab, num_labels=5)
    params = init_params(cfg)
    feats, lengths = corpus_features(cfg, 512)
    print(f"# request length dist: median {np.median(lengths):.0f} tokens")

    rows = []
    for buckets in (None, (64, 128)):
        eng_kw = dict(cfg=cfg, params=params, compute_dtype="bfloat16")
        if buckets:
            eng_kw["length_buckets"] = buckets
        for b in (1, 8):
            eng = STonKGsEngine(batch_size=b, **eng_kw)
            med, p90 = measure_latency(eng, feats, a.requests, b)
            mode = f"bucketed {buckets}" if buckets else "parity"
            rows.append((mode, b, med, p90))
            print(f"# {mode} B={b}: median {med:.1f} ms, p90 {p90:.1f} ms")

    parity1 = next(r for r in rows if r[0] == "parity" and r[1] == 1)
    emit("serving latency, single-statement request (parity, cls_only)",
         parity1[2], "ms median",
         p90_ms=round(parity1[3], 1),
         table=[{"mode": m, "batch": b, "median_ms": round(md, 1),
                 "p90_ms": round(p9, 1)} for m, b, md, p9 in rows])


if __name__ == "__main__":
    main()
