"""Length-bucketed extraction: parity vs speed mode on a realistic corpus.

Parity mode runs the frozen BioBERT backbone over full 256-token padding
for EVERY row (reference quirk: no attention mask,
``stonkgs_for_embeddings.py:91-97`` pads/truncates to 256 and
``stonkgs_model.py:178`` attends over the padding).  Real INDRA evidence
sentences are mostly well under 256 BioBERT tokens, so the opt-in speed
mode (``STonKGsEngine(length_buckets=...)``) buckets rows by true text
length into a few compiled shapes: the backbone runs at the bucket width
and the trunk at bucket+256 with explicit position ids.

This benchmark measures both modes over the same synthetic corpus whose
text-length distribution mimics published biomedical evidence sentences
(lognormal, median ~45 tokens, clipped to [8, 256]) and reports the
numerics delta between the two modes' pooled embeddings — which comes
ONLY from the backbone's attend-over-PAD quirk running at bucket-width
instead of 256-wide padding (the trunk side is exact; see
``tests/test_bucketed_extraction.py``).

Usage:  python benchmarks/bench_bucketed_extract.py [--rows 16384]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax.numpy as jnp

from _util import emit, full_scale_config, init_params

from stonkgs_tpu.api.inference import STonKGsEngine


def realistic_lengths(n: int, text_len: int = 256, seed: int = 0):
    """Token-length distribution shaped like biomedical evidence text.

    Lognormal(mu=ln 45, sigma=0.55): median 45, ~90th pct ~90, a thin
    tail to 256 — consistent with the reference's own >=50-CHARACTER
    evidence filter (``filter_evidences.py:111-144``; 50 chars is ~10
    WordPiece tokens) and typical sentence lengths in INDRA evidences.
    Lengths include [CLS]/[SEP].
    """
    rng = np.random.default_rng(seed)
    raw = rng.lognormal(mean=np.log(45.0), sigma=0.55, size=n)
    return np.clip(raw.astype(np.int64) + 2, 8, text_len)


def corpus_features(cfg, n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    tl, el = cfg.text_len, cfg.entity_len
    lengths = realistic_lengths(n, tl, seed)
    text = rng.integers(4, cfg.bert.vocab_size, (n, tl), dtype=np.int64)
    mask_text = np.arange(tl)[None, :] < lengths[:, None]
    text = np.where(mask_text, text, 0)  # PAD id 0
    ent = rng.integers(0, cfg.kg_vocab_size, (n, el), dtype=np.int64)
    return {
        "input_ids": np.concatenate([text, ent], 1).astype(np.int32),
        "attention_mask": np.concatenate(
            [mask_text.astype(np.int32), np.ones((n, el), np.int32)], 1),
        "token_type_ids": np.concatenate(
            [np.zeros((n, tl), np.int32), np.ones((n, el), np.int32)], 1),
    }, lengths


def run_mode(engine, feats, *, label: str, repeats: int = 3):
    """Time engine.embed over the whole corpus (dispatch+scatter included)."""
    n = len(feats["input_ids"])
    out = engine.embed(feats)              # compile + warmup
    assert np.isfinite(out).all()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = engine.embed(feats)
        best = min(best, time.perf_counter() - t0)
    rate = n / best
    print(f"# {label}: {best*1e3:.1f} ms for {n} rows -> {rate:.1f} pairs/s")
    return out, rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16384)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--kg-vocab", type=int, default=100_000)
    ap.add_argument("--buckets", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--numerics-rows", type=int, default=1024)
    a = ap.parse_args()

    cfg = full_scale_config(a.kg_vocab)
    params = init_params(cfg)
    feats, lengths = corpus_features(cfg, a.rows)
    share = {b: float((lengths <= b).mean()) for b in a.buckets}
    print(f"# length dist: median {np.median(lengths):.0f}, "
          f"p90 {np.percentile(lengths, 90):.0f}, bucket shares {share}")

    parity = STonKGsEngine(cfg=cfg, params=params,
                           compute_dtype="bfloat16",
                           batch_size=a.batch_size)
    bucketed = STonKGsEngine(cfg=cfg, params=params,
                             compute_dtype="bfloat16",
                             batch_size=a.batch_size,
                             length_buckets=tuple(a.buckets))

    out_p, rate_p = run_mode(parity, feats, label="parity (full 256)")
    out_b, rate_b = run_mode(
        bucketed, feats, label=f"bucketed {tuple(a.buckets)}")

    # numerics: the PAD-attention delta, quantified on a subsample
    m = min(a.numerics_rows, a.rows)
    sub = {k: v[:m] for k, v in feats.items()}
    p32 = STonKGsEngine(cfg=cfg, params=params, compute_dtype="float32",
                        batch_size=64).embed(sub)
    b32 = STonKGsEngine(cfg=cfg, params=params, compute_dtype="float32",
                        batch_size=64,
                        length_buckets=tuple(a.buckets)).embed(sub)
    cos = np.sum(p32 * b32, -1) / (
        np.linalg.norm(p32, axis=-1) * np.linalg.norm(b32, axis=-1))
    max_abs = float(np.abs(p32 - b32).max())
    print(f"# numerics (fp32, {m} rows): cosine min {cos.min():.6f} / "
          f"mean {cos.mean():.6f}, max|delta| {max_abs:.4f}")

    emit("bucketed extraction speedup (realistic length dist, "
         f"buckets {tuple(a.buckets)}, B={a.batch_size})",
         rate_b / rate_p, "x vs parity mode",
         parity_pairs_per_sec=round(rate_p, 1),
         bucketed_pairs_per_sec=round(rate_b, 1),
         cosine_min=round(float(cos.min()), 6),
         cosine_mean=round(float(cos.mean()), 6),
         max_abs_delta=round(max_abs, 5))


if __name__ == "__main__":
    main()
