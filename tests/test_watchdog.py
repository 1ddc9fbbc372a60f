"""Failure detection: the non-finite-loss watchdog halts the run.

The reference has no such guard (SURVEY.md §5.3) — a NaN loss would
silently corrupt the parameters until the next crash. Our loop raises
after 3 consecutive non-finite checks, leaving the last checkpoint
restorable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig, STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.train.pretraining import PretrainingConfig, pretrain
from stonkgs_tpu.utils.init import fast_init

CFG = STonKGsConfig(
    bert=BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=32,
                    max_position_embeddings=16),
    kg_vocab_size=110, text_len=8, entity_len=8,
)


def _features(n=16):
    rng = np.random.default_rng(0)
    text = rng.integers(0, CFG.bert.vocab_size, (n, 8))
    ent = rng.integers(0, CFG.kg_vocab_size, (n, 8))
    mlm = np.full((n, 8), -100, np.int64)
    elm = np.full((n, 8), -100, np.int64)
    mlm[:, 1] = rng.integers(0, CFG.bert.vocab_size, n)
    elm[:, 2] = rng.integers(0, CFG.kg_vocab_size, n)
    return {
        "input_ids": np.concatenate([text, ent], 1).astype(np.int64),
        "attention_mask": np.ones((n, 16), np.int64),
        "token_type_ids": np.concatenate(
            [np.zeros((n, 8), np.int64), np.ones((n, 8), np.int64)], 1),
        "masked_lm_labels": mlm,
        "ent_masked_lm_labels": elm,
        "next_sentence_labels": rng.integers(0, 2, (n,)).astype(np.int64),
    }


def test_watchdog_halts_on_nan_loss(tmp_path):
    params = fast_init(
        lambda: stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), CFG))

    def poisoned_loss(params, cfg, batch, **kw):
        # the REPORTED loss is NaN (as from an fp16 overflow in metrics)
        # while the optimization itself stays healthy — isolates the
        # watchdog from parameter corruption so resume can be tested
        loss, metrics = stonkgs.pretraining_loss(params, cfg, batch, **kw)
        metrics = dict(metrics, loss=jnp.float32(jnp.nan))
        return loss, metrics

    run = PretrainingConfig(max_steps=20, micro_batch_size=4, log_steps=1,
                            save_steps=2, compute_dtype="float32")
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        pretrain(CFG, params, _features(), run,
                 checkpoint_dir=str(tmp_path), loss_fn=poisoned_loss)

    # the checkpoint from before the halt survives; training resumes from
    # it with the healthy loss and completes
    state = pretrain(CFG, params, _features(),
                     PretrainingConfig(max_steps=3, micro_batch_size=4,
                                       log_steps=1, save_steps=10,
                                       compute_dtype="float32"),
                     checkpoint_dir=str(tmp_path))
    assert int(state.step) == 3
