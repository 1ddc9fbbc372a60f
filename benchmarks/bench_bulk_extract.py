"""BASELINE config 4: streaming bulk embedding extraction, END TO END.

Unlike ``bench.py`` (device forward only), this measures the whole
``embed_stream`` pipeline over raw (source, target, evidence) rows:
C++ WordPiece tokenization + walk-index gather + masking on the host,
overlapped with the batched bf16 pooler forward on the device
(``STonKGsEngine.embed_stream``).

Reference equivalent: per-row pandas preprocessing + batch-size-1 torch
forward (``stonkgs_for_embeddings.py:100-155,176-184``).

Prints ONE JSON line: pairs/sec/chip end-to-end (vs the 10k north star).
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import emit, full_scale_config, init_params  # noqa: E402

from stonkgs_tpu.api.inference import STonKGsEngine  # noqa: E402
from stonkgs_tpu.data.artifacts import KGArtifacts  # noqa: E402

NORTH_STAR = 10_000.0
RW_LEN = 127  # reference walk length (node2vec.py:307-311)


def _synthetic_vocab(path: Path, words, n_vocab: int = 28996):
    """A WordPiece vocab that gives the tokenizer real work: whole words,
    ##-suffixes of them, and filler pieces."""
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    tokens += list(words)
    tokens += ["##" + w[i:] for w in words for i in (2, 3) if len(w) > i + 1]
    seen, out = set(), []
    for t in tokens:
        if t not in seen:
            seen.add(t)
            out.append(t)
    out += [f"[unused{i}]" for i in range(max(0, n_vocab - len(out)))]
    path.write_text("\n".join(out[:n_vocab]) + "\n")


def _synthetic_rows(n_rows: int, kg_vocab: int, words, seed: int = 0):
    rng = np.random.default_rng(seed)
    names = np.array([f"node{i}" for i in range(kg_vocab)], object)
    src = names[rng.integers(0, kg_vocab, n_rows)]
    tgt = names[rng.integers(0, kg_vocab, n_rows)]
    ev = [
        " ".join(rng.choice(words, rng.integers(12, 40)))
        for _ in range(n_rows)
    ]
    return list(zip(src, tgt, ev))


def main(n_rows: int = 8192, batch_size: int = 128, chunk_rows: int = 2048,
         kg_vocab: int = 100_000):
    rng = np.random.default_rng(1)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = np.array(
        ["".join(rng.choice(letters, rng.integers(3, 11)))
         for _ in range(4000)], object)

    cfg = full_scale_config(kg_vocab)
    params = init_params(cfg)

    names = [f"node{i}" for i in range(kg_vocab)]
    artifacts = KGArtifacts(
        names=names,
        name_to_idx={n: i for i, n in enumerate(names)},
        vectors=rng.normal(size=(kg_vocab, cfg.bert.hidden_size))
                   .astype(np.float32),
        walk_indices=rng.integers(0, kg_vocab, (kg_vocab, RW_LEN),
                                  dtype=np.int32),
        rw_len=RW_LEN,
    )
    with tempfile.TemporaryDirectory() as td:
        vocab_file = Path(td) / "vocab.txt"
        _synthetic_vocab(vocab_file, words)
        from stonkgs_tpu.data.fast_tokenizer import FastBertTokenizer

        engine = STonKGsEngine(
            cfg=cfg, params=params,
            tokenizer=FastBertTokenizer(str(vocab_file)),
            artifacts=artifacts, compute_dtype="bfloat16",
            batch_size=batch_size,
        )
        rows = _synthetic_rows(n_rows, kg_vocab, words)

        # warmup: compile both padded-batch shapes + tokenizer caches
        for _ in engine.embed_stream(rows[: 2 * batch_size],
                                     chunk_rows=batch_size):
            pass

        t0 = time.perf_counter()
        total = 0
        for out in engine.embed_stream(rows, chunk_rows=chunk_rows):
            assert np.isfinite(out).all()
            total += len(out)
        dt = time.perf_counter() - t0
        assert total == n_rows, (total, n_rows)

    emit(
        f"bulk embedding extraction, end-to-end incl. tokenization "
        f"(stonkgs, bf16, batch {batch_size}, chunk {chunk_rows}, "
        f"{n_rows} rows, kg_vocab {kg_vocab})",
        n_rows / dt, "pairs/sec/chip", baseline=NORTH_STAR,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8192)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--chunk-rows", type=int, default=2048)
    ap.add_argument("--kg-vocab", type=int, default=100_000)
    a = ap.parse_args()
    main(a.rows, a.batch_size, a.chunk_rows, a.kg_vocab)
