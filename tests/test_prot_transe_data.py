"""Preprocessing tests for the ProtSTonKGs and TransESTonKGs variants."""

import numpy as np
import pytest

from stonkgs_tpu.data.artifacts import make_random_artifacts
from stonkgs_tpu.data.prot import (
    assemble_prot_text_part, preprocess_prot_for_pretraining,
)
from stonkgs_tpu.data.transe import (
    TransEArtifacts, assemble_transe_part, load_transe_artifacts,
    preprocess_transe_for_finetuning, preprocess_transe_for_pretraining,
)
from stonkgs_tpu.data.wordpiece import BertTokenizer

VOCAB = ["[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "alpha", "beta", "gamma", "activates", "inhibits", "q"]
PROT_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
              "a", "c", "d", "e", "f", "g"]


@pytest.fixture(scope="module")
def lm_tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return BertTokenizer(str(p))


@pytest.fixture(scope="module")
def prot_tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("prot") / "vocab.txt"
    p.write_text("\n".join(PROT_VOCAB) + "\n")
    return BertTokenizer(str(p))


@pytest.fixture(scope="module")
def transe_art():
    names = [f"node{i}" for i in range(10)] + ["rel_up", "rel_down"]
    rng = np.random.default_rng(0)
    return TransEArtifacts(
        names=names,
        name_to_idx={n: i for i, n in enumerate(names)},
        vectors=rng.normal(size=(12, 8)).astype(np.float32),
    )


def test_transe_assembly(transe_art):
    rows, keep = assemble_transe_part(
        ["node1", "node2", "missing"], ["rel_up", "rel_down", "rel_up"],
        ["node3", "node4", "node5"], transe_art)
    assert keep.tolist() == [True, True, False]
    np.testing.assert_array_equal(rows[0], [1, 10, 3, 102])
    np.testing.assert_array_equal(rows[1], [2, 11, 4, 102])


def test_transe_pretraining_features(transe_art, lm_tok):
    n = 8
    feats, skips = preprocess_transe_for_pretraining(
        [f"node{i % 10}" for i in range(n)],
        ["rel_up"] * n,
        [f"node{(i + 1) % 10}" for i in range(n)],
        ["alpha activates beta"] * n,
        transe_art, lm_tok, text_part_length=16, seed=3,
    )
    assert skips == 0
    assert feats["input_ids"].shape == (n + n // 4, 20)
    # entity part: int(4*0.15)=0 masked -> ELM labels all ignored
    assert (feats["ent_masked_lm_labels"] == -100).all()
    assert (feats["token_type_ids"][:, :16] == 0).all()
    assert (feats["token_type_ids"][:, 16:] == 1).all()


def test_transe_finetuning_drops_missing(transe_art, lm_tok):
    feats = preprocess_transe_for_finetuning(
        ["node1", "nope"], ["rel_up", "rel_up"], ["node2", "node3"],
        ["alpha", "beta"], [7, 8], transe_art, lm_tok, text_part_length=8)
    assert len(feats["labels"]) == 1
    assert feats["labels"][0] == 7


def test_transe_artifacts_loader(tmp_path, transe_art):
    path = tmp_path / "transe.tsv"
    with open(path, "w") as f:
        for n, v in zip(transe_art.names, transe_art.vectors):
            f.write(n + "\t" + "\t".join(str(float(x)) for x in v) + "\n")
    loaded = load_transe_artifacts(path)
    assert loaded.names == transe_art.names
    np.testing.assert_allclose(loaded.vectors, transe_art.vectors, rtol=1e-5)


def test_prot_text_part_layout(lm_tok):
    ids, mask = assemble_prot_text_part(
        ["alpha activates beta"], ["gamma"], ["beta inhibits alpha"],
        lm_tok, text_seq_length=24)
    assert ids.shape == (1, 24)
    third = 8
    # leading CLS, then the evidence chunk with ITS OWN CLS (quirk)
    assert ids[0, 0] == lm_tok.cls_id
    assert ids[0, 1] == lm_tok.cls_id
    assert ids[0, third - 1] == lm_tok.sep_id  # SEP after evidence chunk
    assert ids[0, 2 * third - 1] == lm_tok.sep_id
    assert ids[0, -1] == lm_tok.sep_id
    assert mask[0, 0] == 1


def test_prot_pretraining_features(lm_tok, prot_tok):
    artifacts = make_random_artifacts(n_entities=30, dim=8, rw_len=3, seed=1)
    rows = {
        "source": ["node1", "node2"],
        "target": ["node3", "node4"],
        "evidence": ["alpha activates beta", "gamma"],
        "source_description": ["alpha q", "beta"],
        "target_description": ["gamma", "alpha"],
        "source_prot": ["a c d e", "f g a"],
        "target_prot": ["g f", "a c"],
    }
    feats = preprocess_prot_for_pretraining(
        rows, artifacts, lm_tok, prot_tok,
        text_seq_length=24, prot_seq_length=16,
        bigbird_sep_id=7, bigbird_mask_id=8, seed=5,
    )
    ent_len = 3 * 2 + 2
    total = 24 + ent_len + 16
    assert feats["input_ids"].shape == (2, total)
    assert feats["attention_mask"].shape == (2, total)
    # KG segment attention all ones
    assert (feats["attention_mask"][:, 24:24 + ent_len] == 1).all()
    # per-modality mask counts: int(0.15 * len)
    assert ((feats["masked_lm_labels"] != -100).sum(1) == int(24 * 0.15)).all()
    assert ((feats["ent_masked_lm_labels"] != -100).sum(1) == int(ent_len * 0.15)).all()
    assert ((feats["prot_masked_lm_labels"] != -100).sum(1) == int(16 * 0.15)).all()
    # no NSP labels in the prot variant
    assert "next_sentence_labels" not in feats
