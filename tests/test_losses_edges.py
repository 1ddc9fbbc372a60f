"""Loss/op edge-case tests pinned against torch semantics."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from stonkgs_tpu.ops.losses import (
    IGNORE_INDEX, gather_masked_positions, masked_cross_entropy,
    weighted_cross_entropy,
)


def test_masked_ce_matches_torch(rng):
    logits = rng.normal(size=(4, 7, 11)).astype(np.float32)
    labels = rng.integers(0, 11, (4, 7))
    labels[0, :3] = IGNORE_INDEX
    labels[2] = IGNORE_INDEX  # fully ignored row
    ours = float(masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = torch.nn.CrossEntropyLoss(ignore_index=IGNORE_INDEX)(
        torch.tensor(logits).reshape(-1, 11), torch.tensor(labels).reshape(-1)
    ).item()
    assert abs(ours - ref) < 1e-6


def test_masked_ce_all_ignored_is_zero():
    logits = jnp.zeros((2, 3, 5))
    labels = jnp.full((2, 3), IGNORE_INDEX)
    # torch returns NaN here; we return 0 (documented deviation)
    assert float(masked_cross_entropy(logits, labels)) == 0.0


def test_weighted_ce_matches_torch(rng):
    logits = rng.normal(size=(6, 3)).astype(np.float32)
    labels = rng.integers(0, 3, 6)
    weights = np.array([0.2, 1.0, 3.0], np.float32)
    ours = float(weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights)))
    ref = torch.nn.CrossEntropyLoss(weight=torch.tensor(weights))(
        torch.tensor(logits), torch.tensor(labels)).item()
    assert abs(ours - ref) < 1e-6


def test_gather_masked_positions_overflow():
    """More masked positions than K: gather keeps exactly K of them."""
    hidden = jnp.arange(24, dtype=jnp.float32).reshape(1, 6, 4)
    labels = jnp.asarray([[1, 2, 3, 4, 5, 6]])  # all 6 masked
    g_h, g_l, valid = gather_masked_positions(hidden, labels, 4)
    assert g_h.shape == (1, 4, 4)
    assert bool(valid.all())
    assert set(np.asarray(g_l)[0].tolist()) <= {1, 2, 3, 4, 5, 6}


def test_bigbird_fallback_threshold_boundary():
    from stonkgs_tpu.config import BigBirdConfig
    from stonkgs_tpu.models.bigbird import effective_attention_type

    cfg = BigBirdConfig(block_size=16, num_random_blocks=2)
    # HF: block_sparse only if seq_len > (5 + 2r) * block
    thresh = (5 + 4) * 16
    assert effective_attention_type(cfg, thresh) == "original_full"
    assert effective_attention_type(cfg, thresh + 16) == "block_sparse"


def test_walker_dead_end_stays_put():
    from stonkgs_tpu.data.walker import CSRGraph, random_walks

    # directed graph with a sink node
    g = CSRGraph.from_edges(["a", "b"], ["b", "c"], directed=True)
    walks = random_walks(g, walk_len=5, epochs=1, seed=0)
    # node c (id 2) has no outgoing edges -> walk stays at c
    np.testing.assert_array_equal(walks[2], [2, 2, 2, 2, 2])


def test_cache_path_layout(tmp_path, monkeypatch):
    monkeypatch.setenv("STONKGS_TPU_CACHE", str(tmp_path))
    import importlib

    import stonkgs_tpu.utils.cache as cache

    importlib.reload(cache)
    p = cache.cache_path("https://zenodo.org/record/1/files/x.tsv", "species")
    assert p == tmp_path / "species" / "x.tsv"
    p2 = cache.cache_path("https://host/y.bin")
    assert p2 == tmp_path / "y.bin"
