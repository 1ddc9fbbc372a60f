"""Fine-tuning CV harness: learns a separable synthetic task end-to-end."""

import numpy as np
import pytest

import jax

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.train.finetuning import (
    FinetuneConfig, encode_labels, get_train_test_splits,
    run_sequence_classification_cv,
)

TINY = BertConfig(
    vocab_size=64, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=64, max_position_embeddings=16,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
)
CFG = STonKGsConfig(bert=TINY, kg_vocab_size=120, text_len=8, entity_len=8)


def _separable_dataset(n=64, seed=0):
    """Class fully determined by the first text token id."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, n)
    text = rng.integers(10, 64, (n, 8))
    text[:, 0] = np.where(y == 0, 5, 6)
    ent = rng.integers(0, 120, (n, 8))
    return {
        "input_ids": np.concatenate([text, ent], 1),
        "attention_mask": np.ones((n, 16), np.int64),
        "token_type_ids": np.concatenate(
            [np.zeros((n, 8), np.int64), np.ones((n, 8), np.int64)], 1),
    }, np.array(["pos" if v else "neg" for v in y], object)


def test_split_determinism():
    labels = np.array([0, 1] * 20)
    a = get_train_test_splits(labels, n_splits=3)
    b = get_train_test_splits(labels, n_splits=3)
    for s1, s2 in zip(a, b):
        np.testing.assert_array_equal(s1["train_idx"], s2["train_idx"])
        np.testing.assert_array_equal(s1["test_idx"], s2["test_idx"])
    single = get_train_test_splits(labels, n_splits=1)
    assert len(single) == 1


def test_split_size_cap():
    labels = np.array([0, 1] * 100)
    splits = get_train_test_splits(labels, max_dataset_size=50, n_splits=2)
    used = set(splits[0]["train_idx"]) | set(splits[0]["test_idx"])
    assert len(used) == 50


def test_encode_labels_roundtrip():
    labels, tag2id, id2tag = encode_labels(["a", "b", "a", "c"])
    assert sorted(tag2id) == ["a", "b", "c"]
    assert [id2tag[i] for i in labels] == ["a", "b", "a", "c"]


def test_cv_learns_separable_task(tmp_path):
    features, labels_str = _separable_dataset()
    params = stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), CFG)
    params["kg_backbone"] = jax.random.normal(
        jax.random.PRNGKey(1), (CFG.kg_table_size, 32))
    run_cfg = FinetuneConfig(
        epochs=16, lr=3e-3, batch_size=16, cv=2,
        compute_dtype="float32", eval_batch_size=16,
    )
    result = run_sequence_classification_cv(
        features, labels_str, params, CFG, run_cfg,
        task_name="toy", output_dir=str(tmp_path),
    )
    assert result["f1_score_mean"] > 0.9, result
    out = tmp_path / "predicted_labels_stonkgs_toydf.tsv"
    assert out.exists()
    import pandas as pd
    df = pd.read_csv(out, sep="\t")
    assert set(df.columns) == {"split", "index", "predicted_label", "true_label"}
    assert set(df["predicted_label"]).issubset({"pos", "neg"})
