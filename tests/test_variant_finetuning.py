"""Fine-tuning harness over the TransE and ProtSTonKGs variants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig, BigBirdConfig, ProtSTonKGsConfig, STonKGsConfig
from stonkgs_tpu.models import protstonkgs, stonkgs
from stonkgs_tpu.train.finetuning import FinetuneConfig, run_sequence_classification_cv


def test_transe_finetuning_learns():
    """TransE layout (text 8 + 4 slots) through the standard harness."""
    bert = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=12,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    cfg = STonKGsConfig(bert=bert, kg_vocab_size=120, text_len=8, entity_len=4)
    params = stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), cfg)
    params["kg_backbone"] = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.kg_table_size, 32))

    rng = np.random.default_rng(0)
    n = 48
    y = rng.integers(0, 2, n)
    text = rng.integers(6, 64, (n, 8))
    text[:, 1] = np.where(y == 1, 4, 5)
    ent = rng.integers(0, 120, (n, 4))
    feats = {
        "input_ids": np.concatenate([text, ent], 1),
        "attention_mask": np.ones((n, 12), np.int64),
        "token_type_ids": np.concatenate(
            [np.zeros((n, 8), np.int64), np.ones((n, 4), np.int64)], 1),
    }
    labels = np.array(["pos" if v else "neg" for v in y], object)
    result = run_sequence_classification_cv(
        feats, labels, params, cfg,
        FinetuneConfig(epochs=40, lr=3e-3, batch_size=8, cv=2,
                       compute_dtype="float32", eval_batch_size=16),
    )
    assert result["f1_score_mean"] > 0.9, result


def test_protstonkgs_finetuning_learns():
    """Tri-modality classification through the generalized harness."""
    trunk = BigBirdConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                          num_attention_heads=2, intermediate_size=64,
                          max_position_embeddings=64, block_size=4,
                          num_random_blocks=1, attention_type="block_sparse",
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    lm = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=8, hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0)
    prot = BertConfig(vocab_size=30, hidden_size=16, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=32,
                      max_position_embeddings=16, hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    cfg = ProtSTonKGsConfig(
        trunk=trunk, lm=lm, prot=prot,
        lm_vocab_size=64, kg_vocab_size=40, prot_vocab_size=30,
        kg_start_idx=12, prot_start_idx=16, seq_len=32,
        sep_id=4, mask_id=5, unk_id=2, num_labels=2,
    )
    params = protstonkgs.init_protstonkgs_params(jax.random.PRNGKey(0), cfg)
    params["kg_backbone"] = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.kg_table_size, 32))

    rng = np.random.default_rng(0)
    n = 32
    y = rng.integers(0, 2, n)
    text = rng.integers(6, 64, (n, 12))
    text[:, 0] = np.where(y == 1, 6, 7)
    ent = rng.integers(0, 40, (n, 4))
    prot_ids = rng.integers(5, 30, (n, 16))
    feats = {
        "input_ids": np.concatenate([text, ent, prot_ids], 1),
        "attention_mask": np.ones((n, 32), np.int64),
    }
    labels = np.array(["pos" if v else "neg" for v in y], object)
    result = run_sequence_classification_cv(
        feats, labels, params, cfg,
        FinetuneConfig(epochs=40, lr=3e-3, batch_size=8, cv=2,
                       compute_dtype="float32", eval_batch_size=16),
        loss_fn=protstonkgs.classification_loss,
        logits_fn=protstonkgs.classification_logits,
        trunk_cfg=trunk,
    )
    assert result["f1_score_mean"] > 0.85, result
