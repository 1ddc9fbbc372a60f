"""Memory-mapped feature store tests."""

import numpy as np
import pytest

from stonkgs_tpu.data.memmap_dataset import (
    MemmapFeatureStore, memmap_data_iterator,
)


def _feats(n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": rng.integers(0, 1000, (n, 12)).astype(np.int64),
        "next_sentence_labels": rng.integers(0, 2, n).astype(np.int64),
    }


def test_write_and_read_roundtrip(tmp_path):
    feats = _feats(50)
    store = MemmapFeatureStore.write(str(tmp_path / "store"), feats)
    assert len(store) == 50
    np.testing.assert_array_equal(store["input_ids"][:], feats["input_ids"])
    # reopen from disk
    store2 = MemmapFeatureStore(str(tmp_path / "store"))
    assert len(store2) == 50
    np.testing.assert_array_equal(
        store2["next_sentence_labels"][:], feats["next_sentence_labels"])


def test_convert_chunked_matches_concat(tmp_path):
    chunks = [_feats(17, seed=s) for s in range(3)]
    store = MemmapFeatureStore.convert_chunked(
        str(tmp_path / "store"), iter(chunks))
    assert len(store) == 51
    expected = np.concatenate([c["input_ids"] for c in chunks])
    np.testing.assert_array_equal(store["input_ids"][:], expected)


def test_iterator_covers_epoch(tmp_path):
    feats = {"input_ids": np.arange(40)[:, None].astype(np.int64)}
    store = MemmapFeatureStore.write(str(tmp_path / "s"), feats)
    it = memmap_data_iterator(store, batch_size=8, seed=1)
    seen = []
    for _ in range(5):
        batch = next(it)
        assert batch["input_ids"].shape == (8, 1)
        seen.extend(batch["input_ids"].ravel().tolist())
    assert sorted(seen) == list(range(40))


def test_iterator_feeds_training(tmp_path):
    """Store batches drive the standard train step."""
    import jax
    import jax.numpy as jnp

    from stonkgs_tpu.config import BertConfig, STonKGsConfig
    from stonkgs_tpu.models import stonkgs
    from stonkgs_tpu.train.optimizer import make_optimizer
    from stonkgs_tpu.train.pretraining import init_train_state, make_train_step

    cfg = STonKGsConfig(
        bert=BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=16),
        kg_vocab_size=150, text_len=8, entity_len=8)
    rng = np.random.default_rng(0)
    n = 16
    feats = {
        "input_ids": np.concatenate(
            [rng.integers(0, 128, (n, 8)), rng.integers(0, 150, (n, 8))], 1),
        "attention_mask": np.ones((n, 16), np.int64),
        "token_type_ids": np.concatenate(
            [np.zeros((n, 8), np.int64), np.ones((n, 8), np.int64)], 1),
        "masked_lm_labels": np.full((n, 8), -100, np.int64),
        "ent_masked_lm_labels": np.full((n, 8), -100, np.int64),
        "next_sentence_labels": rng.integers(0, 2, (n,)),
    }
    feats["masked_lm_labels"][:, 1] = rng.integers(0, 128, n)
    store = MemmapFeatureStore.write(str(tmp_path / "s"), feats)

    params = stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), cfg)
    params["kg_backbone"] = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.kg_table_size, 32))
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=2)
    state = init_train_state(params, tx)
    step_fn = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    it = memmap_data_iterator(store, batch_size=8)
    for _ in range(2):
        state, metrics = step_fn(
            state, {k: jnp.asarray(v) for k, v in next(it).items()})
    assert np.isfinite(float(metrics["loss"]))
