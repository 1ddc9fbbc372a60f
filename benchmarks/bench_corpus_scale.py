"""Corpus-scale data-path proof: 1M+ synthetic INDRA lines, end to end.

Round-3 verdict: extraction/preprocessing were correct on toy fixtures,
but nothing demonstrated the data path can feed a 35.15M-statement corpus
(the reference ingests ~35,150,093 JSON lines,
``/root/reference/src/stonkgs/data/indra_extraction.py:385``; its
preprocessors chunk at 50k rows with resume,
``data/transe_indra_for_pretraining.py:51-69``).

This bench measures, at ``--lines`` (default 1,000,000) synthetic
statements:

  1. **extraction** — ``read_indra_triples``: JSON-lines -> BEL graph ->
     hygiene filters -> task TSVs + pretraining_triples.tsv
  2. **preprocessing + memmap** — chunked
     ``preprocess_for_pretraining`` (C++ WordPiece tokenizer, vectorized
     walk assembly/masking/NSP) streamed into
     ``MemmapFeatureStore.convert_chunked``

and reports rows/s + peak RSS per stage, plus the projected wall time for
the full 35.15M-line corpus.  Synthetic statements follow the INDRA JSON
schema (Activation/Phosphorylation/Inhibition/Complex + evidence text +
occasional species context), drawn from a 30k-entity / 12k-word pool so
graph and vocab sizes are production-shaped.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import threading
import time

import numpy as np

from _util import emit  # noqa: E402  (sys.path fix inside _util)

REFERENCE_LINES = 35_150_093


class RSSampler:
    """Peak-RSS sampler (GB) over a with-block, via /proc/self/status."""

    def __init__(self, period_s: float = 0.05):
        self.period = period_s
        self.peak = 0.0
        self._stop = threading.Event()
        self._thread = None

    @staticmethod
    def _rss_gb() -> float:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1e6  # kB -> GB
        return 0.0

    def _run(self):
        while not self._stop.wait(self.period):
            self.peak = max(self.peak, self._rss_gb())

    def __enter__(self):
        self.peak = self._rss_gb()
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join()
        self.peak = max(self.peak, self._rss_gb())


# ---------------------------------------------------------------------------
# synthetic corpus generation
# ---------------------------------------------------------------------------

_TYPES = ("Activation", "Inhibition", "Phosphorylation", "Dephosphorylation",
          "IncreaseAmount", "DecreaseAmount", "Complex")
_SPECIES = ("human", "mouse", "rat", None, None, None)


def generate_corpus(path: str, n_lines: int, n_entities: int = 30_000,
                    n_words: int = 12_000, seed: int = 0) -> float:
    """Write ``n_lines`` INDRA-schema JSON lines; returns lines/s."""
    rng = np.random.default_rng(seed)
    genes = [f"GENE{i}" for i in range(n_entities)]
    words = [f"word{i}" for i in range(n_words)]
    t0 = time.perf_counter()
    with open(path, "w") as f:
        # vectorized draws in blocks; json.dumps dominates anyway
        block = 50_000
        for start in range(0, n_lines, block):
            n = min(block, n_lines - start)
            ai = rng.integers(0, n_entities, n)
            # skewed partner choice keeps one giant connected component
            bi = (ai + rng.integers(1, 50, n)) % n_entities
            ti = rng.integers(0, len(_TYPES), n)
            si = rng.integers(0, len(_SPECIES), n)
            wl = rng.integers(8, 30, n)
            wi = rng.integers(0, n_words, (n, 30))
            pm = rng.integers(10_000_000, 40_000_000, n)
            bl = rng.random(n).round(3)
            lines = []
            for j in range(n):
                a, b = genes[ai[j]], genes[bi[j]]
                stype = _TYPES[ti[j]]
                text = (f"{a} {' '.join(words[w] for w in wi[j, :wl[j]])} "
                        f"{b}.")
                ev = {"text": text, "pmid": str(pm[j])}
                sp = _SPECIES[si[j]]
                if sp:
                    ev["context"] = {"species": {"name": sp}}
                agent_a = {"name": a, "db_refs": {"HGNC": str(ai[j] + 1),
                                                  "TEXT": a.lower()}}
                agent_b = {"name": b, "db_refs": {"HGNC": str(bi[j] + 1),
                                                  "TEXT": b.lower()}}
                stmt = {"type": stype, "belief": float(bl[j]),
                        "evidence": [ev]}
                if stype == "Complex":
                    stmt["members"] = [agent_a, agent_b]
                elif stype.endswith("phosphorylation"):
                    stmt["enz"], stmt["sub"] = agent_a, agent_b
                else:
                    stmt["subj"], stmt["obj"] = agent_a, agent_b
                lines.append(json.dumps(stmt))
            f.write("\n".join(lines) + "\n")
    return n_lines / (time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def run(n_lines: int, workdir: str, chunk_rows: int = 100_000) -> None:
    from stonkgs_tpu.data.artifacts import KGArtifacts
    from stonkgs_tpu.data.indra_extraction import read_indra_triples
    from stonkgs_tpu.data.memmap_dataset import MemmapFeatureStore
    from stonkgs_tpu.data.preprocessing import preprocess_for_pretraining

    corpus = os.path.join(workdir, "statements.jsonl")
    print(f"# generating {n_lines:,} synthetic statements ...", flush=True)
    gen_rate = generate_corpus(corpus, n_lines)
    size_gb = os.path.getsize(corpus) / 1e9
    print(f"# corpus written: {size_gb:.2f} GB ({gen_rate:,.0f} lines/s)",
          flush=True)

    # -- stage 1: extraction ------------------------------------------------
    out_dir = os.path.join(workdir, "extracted")
    with RSSampler() as rss:
        t0 = time.perf_counter()
        paths = read_indra_triples(corpus, out_dir)
        t_extract = time.perf_counter() - t0
    emit("extraction throughput (read_indra_triples, synthetic INDRA)",
         n_lines / t_extract, "statements/sec",
         wall_s=round(t_extract, 1), peak_rss_gb=round(rss.peak, 2),
         projected_hours_35M=round(
             REFERENCE_LINES / (n_lines / t_extract) / 3600, 2))

    import pandas as pd

    df = pd.read_csv(paths["pretraining"], sep="\t")
    n_rows = len(df)
    print(f"# pretraining triples: {n_rows:,}", flush=True)

    # -- synthetic KG artifacts + vocab over the extracted node space -------
    names = sorted(set(df["source"]).union(df["target"]))
    rng = np.random.default_rng(1)
    rw_len = 127
    artifacts = KGArtifacts(
        names=names,
        name_to_idx={n: i for i, n in enumerate(names)},
        vectors=rng.standard_normal((len(names), 768)).astype(np.float32),
        walk_indices=rng.integers(0, len(names),
                                  (len(names), rw_len)).astype(np.int32),
        rw_len=rw_len,
    )
    vocab_path = os.path.join(workdir, "vocab.txt")
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab = specials + [f"word{i}" for i in range(12_000)] + \
        [f"gene{i}" for i in range(30_000)] + ["##.", "."]
    # reference vocab ids: PAD 0, UNK 100, CLS 101, SEP 102, MASK 103
    pad = [f"[unused{i}]" for i in range(95)]
    vocab = ["[PAD]"] + pad + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"] + vocab[5:]
    with open(vocab_path, "w") as f:
        f.write("\n".join(vocab) + "\n")
    from stonkgs_tpu.data.fast_tokenizer import FastBertTokenizer

    tokenizer = FastBertTokenizer(vocab_path)

    # -- stage 2: chunked preprocessing -> memmap ----------------------------
    store_dir = os.path.join(workdir, "memmap")

    def chunks():
        for start in range(0, n_rows, chunk_rows):
            part = df.iloc[start:start + chunk_rows]
            yield preprocess_for_pretraining(
                part["source"].to_numpy(object),
                part["target"].to_numpy(object),
                part["evidence"].tolist(),
                artifacts, tokenizer, seed=start,
            )

    with RSSampler() as rss:
        t0 = time.perf_counter()
        MemmapFeatureStore.convert_chunked(store_dir, chunks())
        t_prep = time.perf_counter() - t0
    store = MemmapFeatureStore(store_dir)
    n_out = len(store)
    emit("preprocessing + memmap throughput (batched, C++ tokenizer)",
         n_rows / t_prep, "rows/sec",
         wall_s=round(t_prep, 1), peak_rss_gb=round(rss.peak, 2),
         rows_in=n_rows, rows_out=n_out,  # out = in * (1 + NSP negatives)
         projected_hours_35M=round(
             REFERENCE_LINES / (n_rows / t_prep) / 3600, 2))

    # the chip consumes 177 ex/s at training: one host must outrun that
    prep_rate = n_rows / t_prep
    emit("data-path headroom vs chip (pretraining at 177 ex/s)",
         prep_rate / 177.0, "x",
         note="preprocessing rows/s over the measured single-chip "
              "pre-training examples/s — >1 means one host feeds the chip")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=1_000_000)
    ap.add_argument("--chunk-rows", type=int, default=100_000)
    ap.add_argument("--workdir", default=None,
                    help="working directory (default: a temp dir)")
    a = ap.parse_args()
    if a.workdir:
        os.makedirs(a.workdir, exist_ok=True)
        run(a.lines, a.workdir, a.chunk_rows)
    else:
        with tempfile.TemporaryDirectory(prefix="stonkgs_corpus_") as d:
            run(a.lines, d, a.chunk_rows)
