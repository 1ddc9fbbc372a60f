"""NLP-only baseline: BioBERT sequence classification on evidence text.

Re-implements the reference NLP baseline
(``/root/reference/src/stonkgs/models/nlp_baseline_model.py:103-277``):
``AutoModelForSequenceClassification`` over evidence text only, same
KG-membership filtering for comparability, same CV/weighted-F1 harness
(lr 5e-5, batch 16, truncation+padding).  The model is our functional BERT
encoder + pooled-output classifier (HF BertForSequenceClassification
semantics).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stonkgs_tpu.config import BertConfig
from stonkgs_tpu.models import bert
from stonkgs_tpu.models.heads import classifier_head, init_classifier_head
from stonkgs_tpu.ops.losses import masked_cross_entropy

Array = jax.Array


def preprocess_evidences(evidences, tokenizer, max_length: int = 512):
    """Tokenize evidence-only inputs (truncation + padding)."""
    ids, mask = tokenizer.encode_batch(list(evidences), max_length)
    return {"input_ids": ids.astype(np.int64),
            "attention_mask": mask.astype(np.int64)}


def init_nlp_baseline_params(key: Array, cfg: BertConfig, num_labels: int,
                             pretrained_bert: Optional[dict] = None) -> dict:
    """BERT encoder + classifier head parameter tree."""
    k1, k2 = jax.random.split(key)
    return {
        "bert": pretrained_bert if pretrained_bert is not None
        else bert.init_bert_params(k1, cfg, with_pooler=True),
        "classifier": init_classifier_head(k2, cfg, num_labels),
    }


def classification_logits(
    params: dict, cfg: BertConfig, batch: dict,
    *, deterministic: bool = True, dropout_rng: Optional[Array] = None,
    compute_dtype=jnp.float32, precision=None,
) -> Array:
    """BioBERT-only classifier forward (reference nlp_baseline_model)."""
    if not deterministic and dropout_rng is not None:
        r_bert, r_cls = jax.random.split(dropout_rng)
    else:
        r_bert = r_cls = None
    _, pooled = bert.bert_model(
        params["bert"], cfg,
        input_ids=batch["input_ids"],
        attention_mask=batch.get("attention_mask"),
        deterministic=deterministic, dropout_rng=r_bert,
        compute_dtype=compute_dtype, precision=precision,
    )
    return classifier_head(
        params["classifier"], pooled,
        dropout_prob=cfg.hidden_dropout_prob,
        dropout_rng=r_cls, deterministic=deterministic, precision=precision,
    )


def classification_loss(params, cfg, batch, **kw):
    """Cross-entropy + accuracy metrics for the NLP baseline."""
    logits = classification_logits(params, cfg, batch, **kw)
    loss = masked_cross_entropy(logits, batch["labels"])
    acc = jnp.mean((jnp.argmax(logits, -1) == batch["labels"]).astype(jnp.float32))
    return loss, {"loss": loss, "accuracy": acc}


def train_nlp_baseline(
    cfg: BertConfig,
    params: dict,
    features: Dict[str, np.ndarray],
    *,
    epochs: int = 5,
    lr: float = 5e-5,
    batch_size: int = 16,
    seed: int = 0,
    compute_dtype="float32",
):
    """AdamW + linear decay training over tokenized evidences."""
    from stonkgs_tpu.train.optimizer import make_optimizer
    from stonkgs_tpu.train.pretraining import (
        data_iterator, init_train_state, make_train_step,
    )

    n = len(features["input_ids"])
    total_steps = max(n // batch_size, 1) * epochs
    tx = make_optimizer(params, learning_rate=lr, total_steps=total_steps,
                        frozen_prefixes=())
    state = init_train_state(params, tx, seed)
    step_fn = make_train_step(
        cfg, tx,
        loss_fn=lambda p, c, b, **kw: classification_loss(p, c, b, **kw),
        compute_dtype=getattr(jnp, compute_dtype),
    )
    it = data_iterator(features, batch_size, seed=seed)
    for _ in range(total_steps):
        state, _ = step_fn(state, {k: jnp.asarray(v) for k, v in next(it).items()})
    return state.params


def predict(params, cfg, features, *, batch_size: int = 64,
            compute_dtype=jnp.float32) -> np.ndarray:
    """Batched logits over a tokenized evaluation set."""
    from stonkgs_tpu.utils.batching import batched_apply

    fn = jax.jit(partial(classification_logits, cfg=cfg,
                         compute_dtype=compute_dtype))
    logits = batched_apply(
        lambda chunk: fn(params, batch=chunk), features,
        ("input_ids", "attention_mask"), batch_size)
    return logits.argmax(axis=1)


def run_nlp_baseline_cv(
    cfg: BertConfig,
    features: Dict[str, np.ndarray],
    labels_str,
    pretrained_bert: Optional[dict] = None,
    *,
    epochs: int = 5,
    lr: float = 5e-5,
    batch_size: int = 16,
    cv: int = 5,
    seed: int = 42,
    compute_dtype: str = "float32",
    logger=None,
    task_name: str = "",
    output_dir: Optional[str] = None,
) -> Dict[str, float]:
    """Cross-validated weighted F1 over evidence-only classification.

    ``output_dir`` writes the reference-style predicted-labels TSV
    (``nlp_baseline_model.py:253-258``)."""
    from stonkgs_tpu.train.finetuning import (
        encode_labels, get_train_test_splits, weighted_f1,
    )

    labels, tag2id, id2tag = encode_labels(list(labels_str))
    splits = get_train_test_splits(labels, random_seed=seed, n_splits=cv)
    f1s, rows = [], []
    for fold, idx in enumerate(splits):
        params = init_nlp_baseline_params(
            jax.random.PRNGKey(seed + fold), cfg, len(tag2id),
            pretrained_bert=jax.tree.map(jnp.array, pretrained_bert)
            if pretrained_bert is not None else None,
        )
        train_feats = {k: v[idx["train_idx"]] for k, v in features.items()}
        train_feats["labels"] = labels[idx["train_idx"]]
        params = train_nlp_baseline(
            cfg, params, train_feats,
            epochs=epochs, lr=lr, batch_size=batch_size, seed=seed + fold,
            compute_dtype=compute_dtype,
        )
        test_feats = {k: v[idx["test_idx"]] for k, v in features.items()}
        pred = predict(params, cfg, test_feats,
                       compute_dtype=getattr(jnp, compute_dtype))
        f1 = weighted_f1(labels[idx["test_idx"]], pred)
        f1s.append(f1)
        rows.append((fold, idx["test_idx"], pred, labels[idx["test_idx"]]))
        if logger:
            logger.log_metric("f1_score_weighted", f1, step=fold)
    result = {"f1_score_mean": float(np.mean(f1s)),
              "f1_score_std": float(np.std(f1s))}
    if logger:
        logger.log_param("task name", task_name)
        logger.log_metrics(result)
    if output_dir:
        import os

        import pandas as pd

        os.makedirs(output_dir, exist_ok=True)
        pd.concat([
            pd.DataFrame({
                "split": fold, "index": te.tolist(),
                "predicted_label": [id2tag[p] for p in pred.tolist()],
                "true_label": [id2tag[t] for t in true.tolist()],
            }) for fold, te, pred, true in rows
        ], ignore_index=True).to_csv(
            os.path.join(output_dir,
                         f"predicted_labels_nlp_{task_name}df.tsv"),
            sep="\t", index=False)
    return result
