"""Offline execution of the EMMAA curation demo and the API example.

The reference's ``api/get_emmaa.py`` and ``api/example.py`` are network-
gated; here the download seams (``ensure``, ``get_*_model``) are mocked so
the full logic — statement parsing, batched inference, the 0.2/0.85
belief-vs-model quadrant selection, TSV/pickle/scatter outputs — executes
in CI. Reference: ``get_emmaa.py:38-85``, ``example.py:18-45``.
"""

import gzip
import json
import pickle

import numpy as np
import pandas as pd
import pytest
import torch

from stonkgs_tpu.api import get_emmaa
from stonkgs_tpu.api.get_emmaa import run_emmaa_demo, select_curation_candidates
from stonkgs_tpu.api.inference import STonKGsEngine
from stonkgs_tpu.data.artifacts import KGArtifacts, save_kg_artifacts

from torch_golden import GoldenSTonKGs

TINY = dict(
    vocab_size=128, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=64, type_vocab_size=2,
)
KG_VOCAB = 110
RW_LEN = 15
TEXT_LEN = 32

VOCAB = ["[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "akt1", "mtor", "gsk3b", "activates", "inhibits", "binds"]

NODE_NAMES = [
    "p(HGNC:391 ! AKT1)", "p(HGNC:3942 ! MTOR)", "p(HGNC:4617 ! GSK3B)",
]


def _agent(name, ident):
    return {"name": name,
            "db_refs": {"HGNC": ident, "TEXT": name.lower()}}


def _statement(stype, a, b, belief, text, matches_hash):
    key = {"Activation": ("subj", "obj"), "Inhibition": ("subj", "obj"),
           "Phosphorylation": ("enz", "sub")}[stype]
    return {
        "type": stype, key[0]: a, key[1]: b, "belief": belief,
        "matches_hash": matches_hash,
        "evidence": [{"text": text, "pmid": "1"}],
    }


def _make_engine(tmp_path, num_labels, seed=0):
    golden = GoldenSTonKGs(TINY, KG_VOCAB, TEXT_LEN, num_labels=num_labels)
    model_dir = tmp_path / f"model{num_labels}"
    model_dir.mkdir()
    torch.save(golden.reference_state_dict(), model_dir / "pytorch_model.bin")
    (model_dir / "config.json").write_text(
        json.dumps({**TINY, "num_labels": num_labels}))

    rng = np.random.default_rng(seed)
    names = NODE_NAMES + [f"node{i}" for i in range(KG_VOCAB - len(NODE_NAMES))]
    artifacts = KGArtifacts(
        names=names,
        name_to_idx={n: i for i, n in enumerate(names)},
        vectors=golden.kg_vectors,
        walk_indices=rng.integers(0, KG_VOCAB, (KG_VOCAB, RW_LEN),
                                  dtype=np.int32),
        rw_len=RW_LEN,
    )
    save_kg_artifacts(artifacts, tmp_path / "embeddings.tsv",
                      tmp_path / "walks.tsv")
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n")
    return STonKGsEngine.from_pretrained(
        str(model_dir), str(tmp_path / "embeddings.tsv"),
        str(tmp_path / "walks.tsv"), vocab_file=str(vocab_file),
        compute_dtype="float32", batch_size=4,
    )


def test_select_curation_candidates_quadrants():
    df = pd.DataFrame({
        "stmt_hash": [str(i) for i in range(6)],
        "belief":  [0.1, 0.1, 0.9, 0.9, 0.5, 0.1],
        "correct": [0.1, 0.9, 0.1, 0.9, 0.1, 0.5],
    })
    # all four disagreement/agreement-extreme quadrants selected; middle not
    assert select_curation_candidates(df) == {"0", "1", "2", "3"}


def test_run_emmaa_demo_offline(tmp_path, monkeypatch):
    statements = [
        _statement("Activation", _agent("AKT1", "391"), _agent("MTOR", "3942"),
                   0.95, "AKT1 activates MTOR.", "111"),
        _statement("Inhibition", _agent("GSK3B", "4617"), _agent("MTOR", "3942"),
                   0.10, "GSK3B inhibits MTOR.", "222"),
        _statement("Phosphorylation", _agent("AKT1", "391"),
                   _agent("GSK3B", "4617"),
                   0.50, "AKT1 phosphorylates GSK3B.", "333"),
    ]
    gz_path = tmp_path / "statements_test.gz"
    with gzip.open(gz_path, "wt") as f:
        json.dump(statements, f)

    engine = _make_engine(tmp_path, num_labels=2)
    monkeypatch.setattr(get_emmaa, "ensure", lambda url, sub: gz_path)
    import stonkgs_tpu.api.api as api_mod

    monkeypatch.setattr(api_mod, "get_correct_binary_model", lambda: engine)

    results_path, curation_path = run_emmaa_demo(
        url="https://example.org/assembled/test/statements_test.gz")

    df = pd.read_csv(results_path, sep="\t", dtype={"stmt_hash": str})
    assert list(df.columns) == ["stmt_hash", "belief", "source", "target",
                                "evidence", "incorrect", "correct"]
    assert len(df) == 3
    probs = df[["incorrect", "correct"]].to_numpy()
    assert np.isfinite(probs).all()
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)

    with open(curation_path, "rb") as f:
        curated = pickle.load(f)
    expected = select_curation_candidates(
        df[["stmt_hash", "belief", "correct"]])
    assert {s["matches_hash"] for s in curated} == expected
    assert results_path.with_suffix(".svg").name.endswith(".svg")
    assert (tmp_path / "statements_test.scatter.svg").exists()


def test_api_example_offline(tmp_path, monkeypatch):
    from stonkgs_tpu.api import example

    engine = _make_engine(tmp_path, num_labels=3)
    import stonkgs_tpu.api.api as api_mod

    monkeypatch.setattr(api_mod, "get_species_model", lambda: engine)
    out_path = tmp_path / "species" / "predictions.tsv"
    monkeypatch.setattr(example, "SPECIES_PREDICTION_PATH", out_path)

    example.main()

    df = pd.read_csv(out_path, sep="\t")
    assert list(df.columns) == ["source", "target", "evidence",
                                "mouse", "rat", "human"]
    assert len(df) == len(example.EXAMPLE_ROWS)
    probs = df[["mouse", "rat", "human"]].to_numpy()
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
