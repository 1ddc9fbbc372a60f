"""End-to-end parity of the JAX STonKGs model vs the torch golden fixture.

Validates the full reference semantics chain: KG-table index-space quirk,
maskless frozen backbone, trunk-on-embeddings, split ELM head, NSP, and
classification — plus equivalence of the gathered-position loss path to the
reference's dense-logits loss.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.ops.losses import IGNORE_INDEX, masked_cross_entropy
from stonkgs_tpu.utils.hf_loader import stonkgs_params_from_state_dict

from torch_golden import GoldenSTonKGs

TINY = dict(
    vocab_size=128,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=64,
    type_vocab_size=2,
)
KG_VOCAB = 120  # > 103 so the special-id offset quirk is exercised
TEXT_LEN = 32
ENT_LEN = 32


@pytest.fixture(scope="module")
def golden():
    return GoldenSTonKGs(TINY, KG_VOCAB, TEXT_LEN, num_labels=5)


@pytest.fixture(scope="module")
def jax_model(golden):
    cfg = STonKGsConfig(
        bert=BertConfig(**TINY),
        kg_vocab_size=KG_VOCAB,
        text_len=TEXT_LEN,
        entity_len=ENT_LEN,
        num_labels=5,
    )
    params = stonkgs_params_from_state_dict(golden.reference_state_dict(), cfg)
    params["kg_backbone"] = stonkgs.build_kg_table(
        params["lm_backbone"], cfg.bert, golden.kg_vectors, precision="highest"
    )
    return cfg, params


def _batch(rng, B=2):
    S = TEXT_LEN + ENT_LEN
    text = rng.integers(0, TINY["vocab_size"], (B, TEXT_LEN))
    # entity ids span the full data index range incl. around the 100/102/103 quirk
    ent = rng.integers(0, KG_VOCAB, (B, ENT_LEN))
    ent[:, 15] = 102   # SEP slots like the real layout
    ent[:, -1] = 102
    ent[0, 3] = 103    # a masked entity
    ent[1, 4] = 100    # an UNK entity
    ids = np.concatenate([text, ent], axis=1)
    mask = np.ones((B, S), np.int64)
    mask[0, 20:TEXT_LEN] = 0  # text padding
    tti = np.concatenate(
        [np.zeros((B, TEXT_LEN), np.int64), np.ones((B, ENT_LEN), np.int64)], axis=1
    )
    return ids, mask, tti


def test_kg_table_layout(golden, jax_model):
    _, params = jax_model
    np.testing.assert_allclose(
        np.asarray(params["kg_backbone"]), golden.kg_table.numpy(), atol=2e-5
    )
    # entity k >= 104 lives at row k (data index k fetches vector k-3: quirk)
    table = np.asarray(params["kg_backbone"])
    np.testing.assert_array_equal(table[99], golden.kg_vectors[99])
    np.testing.assert_array_equal(table[101], golden.kg_vectors[100])
    np.testing.assert_array_equal(table[104], golden.kg_vectors[101])


def test_pretraining_logits_parity(golden, jax_model, rng):
    cfg, params = jax_model
    ids, mask, tti = _batch(rng)
    g_mlm, g_elm, g_nsp, g_pooled, _ = golden(ids, mask, tti)
    mlm, elm, nsp, pooled = stonkgs.pretraining_logits(
        params, cfg,
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tti),
        precision="highest",
    )
    np.testing.assert_allclose(np.asarray(pooled), g_pooled.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mlm), g_mlm.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(elm), g_elm.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(nsp), g_nsp.numpy(), atol=3e-5, rtol=1e-4)


def test_classification_parity(golden, jax_model, rng):
    cfg, params = jax_model
    ids, mask, tti = _batch(rng)
    *_, g_cls = golden(ids, mask, tti)
    logits = stonkgs.classification_logits(
        params, cfg,
        {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask),
         "token_type_ids": jnp.asarray(tti)},
        precision="highest",
    )
    np.testing.assert_allclose(np.asarray(logits), g_cls.numpy(), atol=3e-5, rtol=1e-4)


def test_pretraining_loss_matches_torch_and_gather(golden, jax_model, rng):
    cfg, params = jax_model
    B = 2
    ids, mask, tti = _batch(rng, B)

    # labels: IGNORE everywhere except a few masked positions (fixed count/row)
    mlm_labels = np.full((B, TEXT_LEN), IGNORE_INDEX, np.int64)
    elm_labels = np.full((B, ENT_LEN), IGNORE_INDEX, np.int64)
    for b in range(B):
        pos = rng.choice(TEXT_LEN, 4, replace=False)
        mlm_labels[b, pos] = rng.integers(0, TINY["vocab_size"], 4)
        epos = rng.choice(ENT_LEN, 4, replace=False)
        elm_labels[b, epos] = rng.integers(0, KG_VOCAB, 4)
    nsp_labels = np.array([0, 1], np.int64)

    g_mlm, g_elm, g_nsp, *_ = golden(ids, mask, tti)
    ce = torch.nn.CrossEntropyLoss()
    torch_loss = (
        ce(g_mlm.reshape(-1, TINY["vocab_size"]), torch.tensor(mlm_labels).reshape(-1))
        + ce(g_elm.reshape(-1, KG_VOCAB), torch.tensor(elm_labels).reshape(-1))
        + ce(torch.tensor(np.asarray(g_nsp)), torch.tensor(nsp_labels))
    ).item()

    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "token_type_ids": jnp.asarray(tti),
        "masked_lm_labels": jnp.asarray(mlm_labels),
        "ent_masked_lm_labels": jnp.asarray(elm_labels),
        "next_sentence_labels": jnp.asarray(nsp_labels),
    }
    dense_loss, _ = stonkgs.pretraining_loss(
        params, cfg, batch, dense_heads=True, precision="highest"
    )
    gather_loss, _ = stonkgs.pretraining_loss(
        params, cfg, batch,
        max_text_predictions=4, max_entity_predictions=4, precision="highest",
    )
    assert abs(float(dense_loss) - torch_loss) < 1e-4
    assert abs(float(gather_loss) - float(dense_loss)) < 1e-5


def test_gather_handles_uneven_counts(jax_model, rng):
    """Gathered loss == dense loss even when rows have fewer masks than K."""
    cfg, params = jax_model
    B = 2
    ids, mask, tti = _batch(rng, B)
    mlm_labels = np.full((B, TEXT_LEN), IGNORE_INDEX, np.int64)
    elm_labels = np.full((B, ENT_LEN), IGNORE_INDEX, np.int64)
    mlm_labels[0, [1, 5]] = [7, 9]         # 2 masks in row 0, 0 in row 1
    elm_labels[1, [0, 2, 3]] = [10, 110, 50]
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "token_type_ids": jnp.asarray(tti),
        "masked_lm_labels": jnp.asarray(mlm_labels),
        "ent_masked_lm_labels": jnp.asarray(elm_labels),
        "next_sentence_labels": jnp.asarray(np.array([0, 0])),
    }
    dense_loss, _ = stonkgs.pretraining_loss(
        params, cfg, batch, dense_heads=True, precision="highest"
    )
    gather_loss, _ = stonkgs.pretraining_loss(
        params, cfg, batch,
        max_text_predictions=5, max_entity_predictions=5, precision="highest",
    )
    assert abs(float(gather_loss) - float(dense_loss)) < 1e-5
