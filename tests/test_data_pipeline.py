"""Data-path tests: masking distribution, NSP negatives, sequence assembly.

Golden expectations are derived from the reference semantics
(``indra_for_pretraining.py``, ``stonkgs_for_embeddings.py``,
``stonkgs_finetuning.py``) — see docstrings in stonkgs_tpu.data.
"""

import numpy as np
import pytest

from stonkgs_tpu.data.artifacts import (
    KGArtifacts, load_kg_artifacts, make_random_artifacts, save_kg_artifacts,
)
from stonkgs_tpu.data.masking import (
    IGNORE_INDEX, add_negative_nsp_samples, mask_tokens, mask_tokens_jax,
)
from stonkgs_tpu.data.preprocessing import (
    assemble_entity_half,
    preprocess_for_embeddings,
    preprocess_for_finetuning,
    preprocess_for_pretraining,
)
from stonkgs_tpu.data.wordpiece import BertTokenizer

VOCAB = [
    "[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "alpha", "beta", "gamma", "delta", "activates", "inhibits", "binds",
]


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    p = tmp_path_factory.mktemp("v") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return BertTokenizer(str(p))


@pytest.fixture(scope="module")
def artifacts():
    return make_random_artifacts(n_entities=50, dim=16, rw_len=7, seed=1)


def test_mask_tokens_counts_and_labels():
    rng = np.random.default_rng(0)
    B, L, V = 64, 256, 1000
    tokens = rng.integers(0, V, (B, L))
    masked, labels = mask_tokens(tokens.copy(), V, rng, mask_id=103)
    n_pred = int(L * 0.15)
    # exactly int(0.15 * L) predictions per row (reference: random.sample)
    assert ((labels != IGNORE_INDEX).sum(axis=1) == n_pred).all()
    sel = labels != IGNORE_INDEX
    # labels hold the ORIGINAL ids at selected positions
    np.testing.assert_array_equal(labels[sel], tokens[sel])
    # unselected positions are untouched
    np.testing.assert_array_equal(masked[~sel], tokens[~sel])
    # ~80% of selected positions became the mask id
    frac_mask = (masked[sel] == 103).mean()
    assert 0.74 < frac_mask < 0.86


def test_mask_tokens_jax_matches_numpy_distribution():
    import jax
    import jax.numpy as jnp

    B, L, V = 32, 64, 500
    tokens = jnp.asarray(np.random.default_rng(3).integers(0, V, (B, L)), jnp.int32)
    masked, labels = mask_tokens_jax(jax.random.PRNGKey(0), tokens, V, mask_id=7)
    n_pred = int(L * 0.15)
    assert ((np.asarray(labels) != IGNORE_INDEX).sum(axis=1) == n_pred).all()
    sel = np.asarray(labels) != IGNORE_INDEX
    np.testing.assert_array_equal(np.asarray(labels)[sel], np.asarray(tokens)[sel])
    np.testing.assert_array_equal(np.asarray(masked)[~sel], np.asarray(tokens)[~sel])


def test_assemble_entity_half(artifacts):
    src = np.array(["node3", "node7"], object)
    tgt = np.array(["node4", "missing-node"], object)
    ent = assemble_entity_half(src, tgt, artifacts, sep_id=102, unk_id=100)
    rw = artifacts.rw_len
    assert ent.shape == (2, 2 * rw + 2)
    np.testing.assert_array_equal(ent[0, :rw], artifacts.walk_indices[3])
    assert ent[0, rw] == 102 and ent[0, -1] == 102
    np.testing.assert_array_equal(ent[0, rw + 1:-1], artifacts.walk_indices[4])
    # UNK fallback for unseen node (stonkgs_for_embeddings.py:117-128)
    np.testing.assert_array_equal(ent[1, rw + 1:-1], np.full(rw, 100))


def test_preprocess_for_embeddings_layout(artifacts, tokenizer):
    src = np.array(["node1", "node2"], object)
    tgt = np.array(["node3", "node4"], object)
    ev = ["alpha activates beta", "gamma inhibits delta"]
    out = preprocess_for_embeddings(
        src, tgt, ev, artifacts, tokenizer, apply_masking=False
    )
    half = artifacts.rw_len * 2 + 2
    S = 2 * half
    assert out["input_ids"].shape == (2, S)
    assert (out["token_type_ids"][:, :half] == 0).all()
    assert (out["token_type_ids"][:, half:] == 1).all()
    # entity half attention is all ones (indra_for_pretraining.py:213)
    assert (out["attention_mask"][:, half:] == 1).all()
    assert (out["next_sentence_labels"] == 0).all()
    # text half: CLS ... SEP ... PAD against the tokenizer directly
    ids, mask = tokenizer.encode(ev[0], half)
    np.testing.assert_array_equal(out["input_ids"][0, :half], ids)
    np.testing.assert_array_equal(out["attention_mask"][0, :half], mask)
    # no masking -> all labels ignored
    assert (out["masked_lm_labels"] == IGNORE_INDEX).all()


def test_preprocess_for_embeddings_masking_quirk(artifacts, tokenizer):
    """Reference applies 15% masking even at inference (stonkgs_for_embeddings.py:133-143)."""
    src = np.array(["node1"] * 8, object)
    tgt = np.array(["node2"] * 8, object)
    ev = ["alpha activates beta"] * 8
    out = preprocess_for_embeddings(
        src, tgt, ev, artifacts, tokenizer, apply_masking=True, seed=5
    )
    half = artifacts.rw_len * 2 + 2
    n_pred = int(half * 0.15)
    assert ((out["masked_lm_labels"] != IGNORE_INDEX).sum(axis=1) == n_pred).all()
    assert ((out["ent_masked_lm_labels"] != IGNORE_INDEX).sum(axis=1) == n_pred).all()


def test_preprocess_for_finetuning(artifacts, tokenizer):
    src = np.array(["node1", "node2"], object)
    tgt = np.array(["node3", "node4"], object)
    ev = ["alpha binds beta", "delta"]
    labels = np.array([1, 0])
    out = preprocess_for_finetuning(src, tgt, ev, labels, artifacts, tokenizer)
    assert set(out) == {"input_ids", "attention_mask", "token_type_ids", "labels"}
    np.testing.assert_array_equal(out["labels"], labels)
    half = artifacts.rw_len * 2 + 2
    # fine-tuning applies NO masking: input ids are raw tokens + walks
    ids, _ = tokenizer.encode(ev[0], half)
    np.testing.assert_array_equal(out["input_ids"][0, :half], ids)


def test_preprocess_for_pretraining_negatives(artifacts, tokenizer):
    n = 40
    src = np.array([f"node{i % 50}" for i in range(n)], object)
    tgt = np.array([f"node{(i + 1) % 50}" for i in range(n)], object)
    ev = ["alpha activates beta gamma"] * n
    out = preprocess_for_pretraining(
        src, tgt, ev, artifacts, tokenizer, seed=7, shuffle=False
    )
    # 25% negatives appended (indra_for_pretraining.py:80-126)
    assert len(out["input_ids"]) == n + n // 4
    assert out["next_sentence_labels"][:n].sum() == 0
    assert (out["next_sentence_labels"][n:] == 1).all()


def test_nsp_negative_swaps_halves():
    rng = np.random.default_rng(0)
    n, half = 8, 6
    feats = {
        "input_ids": np.arange(n * 2 * half).reshape(n, 2 * half),
        "attention_mask": np.tile(np.arange(n)[:, None], (1, 2 * half)),
        "token_type_ids": np.zeros((n, 2 * half), np.int64),
        "masked_lm_labels": np.tile(np.arange(n)[:, None], (1, half)),
        "ent_masked_lm_labels": np.tile(np.arange(n)[:, None] * 10, (1, half)),
        "next_sentence_labels": np.zeros(n, np.int64),
    }
    neg = add_negative_nsp_samples(feats, rng, 0.5, text_part_length=half)
    assert len(neg["input_ids"]) == 4
    for r in range(4):
        i = neg["attention_mask"][r, 0]          # text row id
        j = neg["ent_masked_lm_labels"][r, 0] // 10  # entity row id
        np.testing.assert_array_equal(
            neg["input_ids"][r, :half], feats["input_ids"][i, :half])
        np.testing.assert_array_equal(
            neg["input_ids"][r, half:], feats["input_ids"][j, half:])
        np.testing.assert_array_equal(
            neg["masked_lm_labels"][r], feats["masked_lm_labels"][i])
    assert (neg["next_sentence_labels"] == 1).all()


def test_artifacts_tsv_roundtrip(tmp_path, artifacts):
    ep = tmp_path / "embeddings.tsv"
    wp = tmp_path / "walks.tsv"
    save_kg_artifacts(artifacts, ep, wp)
    loaded = load_kg_artifacts(ep, wp)
    assert loaded.names == artifacts.names
    np.testing.assert_allclose(loaded.vectors, artifacts.vectors, rtol=1e-6)
    np.testing.assert_array_equal(loaded.walk_indices, artifacts.walk_indices)


def test_replace_mlm_tokens_reference_stream():
    """Single-sequence masking matches the reference algorithm's RNG stream."""
    import random

    from stonkgs_tpu.data.masking import replace_mlm_tokens

    tokens = list(range(40))
    random.seed(1234)
    ids, labels = replace_mlm_tokens(tokens, vocab_len=100, mask_id=103)
    n_pred = int(40 * 0.15)
    sel = [i for i, l in enumerate(labels) if l != -100]
    assert len(sel) == n_pred
    for i in sel:
        assert labels[i] == tokens[i]
    for i in range(40):
        if i not in sel:
            assert ids[i] == tokens[i]
    # deterministic under seeding
    random.seed(1234)
    ids2, labels2 = replace_mlm_tokens(tokens, vocab_len=100, mask_id=103)
    assert ids == ids2 and labels == labels2
    # package-root compat export
    import stonkgs_tpu

    assert stonkgs_tpu.replace_mlm_tokens is replace_mlm_tokens
    assert callable(stonkgs_tpu.prepare_df)
