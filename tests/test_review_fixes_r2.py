"""Regression tests for the round-2 data/api review fixes."""

import numpy as np
import pandas as pd
import pytest

from stonkgs_tpu.data.transe import (
    TransEArtifacts,
    transe_pretraining_to_tsv,
)


class _StubTok:
    vocab_size = 64
    mask_id = 3

    def encode_batch(self, texts, length):
        ids = np.zeros((len(texts), length), np.int32)
        mask = np.ones((len(texts), length), np.int32)
        for i, t in enumerate(texts):
            ids[i, : min(len(t), length)] = [
                (ord(c) % 60) + 4 for c in t[:length]]
        return ids, mask


def _artifacts(names):
    all_names = list(names) + ["increases"]
    return TransEArtifacts(
        names=all_names,
        name_to_idx={n: i for i, n in enumerate(all_names)},
        vectors=np.zeros((len(all_names), 4), np.float32),
    )


def test_transe_resume_does_not_duplicate_after_skips(tmp_path):
    """Resume must continue from the INPUT row consumed, not the OUTPUT
    row count — otherwise skipped (KeyError) rows shift the restart point
    back and duplicate examples (a reference flaw, ``:51-69``)."""
    known = [f"n{i}" for i in range(8)]
    art = _artifacts(known)
    rows = []
    for i in range(10):
        # rows 2 and 5 use an unknown head -> skipped by preprocessing
        src = "UNKNOWN" if i in (2, 5) else known[i % 8]
        rows.append({"source": src, "relation": "increases",
                     "target": known[(i + 1) % 8], "evidence": f"ev {i}"})
    df = pd.DataFrame(rows)
    out = tmp_path / "positives.tsv"

    # phase 1: process only the first chunk (4 input rows, 1 skipped)
    skips = transe_pretraining_to_tsv(
        df.iloc[:4], art, _StubTok(), str(out), chunk_size=4)
    assert skips == 1
    n_phase1 = len(pd.read_csv(out, sep="\t"))
    assert n_phase1 == 3

    # phase 2: resume over the FULL df; progress sidecar says 4 consumed
    skips = transe_pretraining_to_tsv(
        df, art, _StubTok(), str(out), chunk_size=4)
    assert skips == 1  # only row 5 in the remaining input
    final = pd.read_csv(out, sep="\t")
    assert len(final) == 8  # 10 inputs - 2 skipped, NO duplicates


def test_memmap_iterator_rejects_small_store(tmp_path):
    from stonkgs_tpu.data.memmap_dataset import (
        MemmapFeatureStore, memmap_data_iterator,
    )

    feats = {"input_ids": np.arange(12).reshape(6, 2).astype(np.int32)}
    MemmapFeatureStore.write(str(tmp_path / "store"), feats)
    store = MemmapFeatureStore(str(tmp_path / "store"))
    with pytest.raises(ValueError, match="batch_size"):
        next(memmap_data_iterator(store, batch_size=16))


def test_data_iterator_rejects_small_dataset():
    from stonkgs_tpu.train.pretraining import data_iterator

    with pytest.raises(ValueError, match="batch_size"):
        next(data_iterator({"input_ids": np.zeros((3, 4))}, batch_size=8))


def test_batched_apply_empty_input_keeps_trailing_shape():
    from stonkgs_tpu.utils.batching import batched_apply

    feats = {"x": np.zeros((0, 5), np.float32)}
    out = batched_apply(lambda c: c["x"] @ np.ones((5, 7), np.float32),
                        feats, ("x",), batch_size=4)
    assert out.shape == (0, 7)
    # downstream softmax-style reductions now work on empty results
    assert out.max(axis=-1, keepdims=True).shape == (0, 1)
