"""Baseline models: KG max-pool classifier and NLP-only BERT classifier."""

import numpy as np
import pytest

import jax

from stonkgs_tpu.baselines.kg_baseline import (
    build_node2vec_features, build_transe_features, ins_class_weights,
    run_kg_baseline_cv,
)
from stonkgs_tpu.baselines.nlp_baseline import (
    preprocess_evidences, run_nlp_baseline_cv,
)
from stonkgs_tpu.config import BertConfig
from stonkgs_tpu.data.artifacts import make_random_artifacts
from stonkgs_tpu.data.transe import TransEArtifacts
from stonkgs_tpu.data.wordpiece import BertTokenizer

VOCAB = ["[PAD]", "[unused0]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "up", "down", "alpha", "beta", "signal"]


def test_node2vec_features_oov():
    art = make_random_artifacts(n_entities=10, dim=4, rw_len=3, seed=0)
    feats = build_node2vec_features(art, ["node1", "missing"], ["node2", "node3"])
    assert feats.shape == (2, 6, 4)
    np.testing.assert_array_equal(feats[1, :3], 0.0)  # OOV source -> zeros
    assert np.abs(feats[1, 3:]).sum() > 0


def test_transe_features():
    names = ["a", "b", "rel"]
    art = TransEArtifacts(names, {n: i for i, n in enumerate(names)},
                          np.arange(9).reshape(3, 3).astype(np.float32))
    feats = build_transe_features(art, ["a"], ["rel"], ["b"])
    np.testing.assert_array_equal(feats[0, 0], [0, 1, 2])
    np.testing.assert_array_equal(feats[0, 1], [6, 7, 8])
    np.testing.assert_array_equal(feats[0, 2], [3, 4, 5])


def test_ins_weights():
    w = ins_class_weights(np.array([0, 0, 0, 1]), 2)
    np.testing.assert_allclose(w, [1 / 3, 1.0])


def test_kg_baseline_learns_separable():
    """Class determined by the sign of one embedding dimension."""
    rng = np.random.default_rng(0)
    n = 120
    y = rng.integers(0, 2, n)
    feats = rng.normal(size=(n, 8, 16)).astype(np.float32)
    feats[:, :, 0] = np.where(y[:, None] == 1, 3.0, -3.0)
    labels = np.array(["pos" if v else "neg" for v in y], object)
    # higher lr than the reference default: the double-softmax quirk
    # flattens gradients, and this test wants quick convergence
    result = run_kg_baseline_cv(feats, labels, epochs=30, lr=1e-2, cv=2, seed=1)
    assert result["f1_score_mean"] > 0.9, result


def test_nlp_baseline_learns_separable(tmp_path):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(VOCAB) + "\n")
    tok = BertTokenizer(str(vocab))
    rng = np.random.default_rng(0)
    n = 48
    y = rng.integers(0, 2, n)
    texts = ["up alpha signal" if v else "down beta signal" for v in y]
    feats = preprocess_evidences(texts, tok, max_length=8)
    cfg = BertConfig(vocab_size=len(VOCAB), hidden_size=32,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=64, max_position_embeddings=8,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    labels = np.array(["pos" if v else "neg" for v in y], object)
    result = run_nlp_baseline_cv(
        cfg, feats, labels, epochs=40, lr=3e-3, batch_size=8, cv=2, seed=0)
    assert result["f1_score_mean"] > 0.9, result
