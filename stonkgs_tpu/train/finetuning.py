"""Fine-tuning: cross-validated sequence classification.

Re-implements the reference CV harness
(``/root/reference/src/stonkgs/models/stonkgs_finetuning.py:53-513``):
deterministic seed-42 splits (StratifiedShuffleSplit size cap -> 5-fold
KFold), per-fold training from the pre-trained checkpoint with a fresh
classifier head, weighted-F1 evaluation, predicted-label dump — but the
training loop is the jitted pjit step from ``train.pretraining`` with
``classification_loss``.

The 10-task benchmark battery (``run_all_fine_tuning_tasks``,
``stonkgs_finetuning.py:563-601``) is reproduced in
``stonkgs_tpu.cli.finetune``.
"""

from __future__ import annotations

import dataclasses
import os
from collections import Counter
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stonkgs_tpu.config import STonKGsConfig
from stonkgs_tpu.models import stonkgs
from stonkgs_tpu.models.heads import init_classifier_head
from stonkgs_tpu.train.optimizer import make_optimizer
from stonkgs_tpu.train.pretraining import (
    data_iterator, init_train_state, make_train_step,
)
from stonkgs_tpu.utils.logging import RunLogger


def get_train_test_splits(
    labels: np.ndarray,
    random_seed: int = 42,
    n_splits: int = 5,
    max_dataset_size: int = 100_000,
) -> List[Dict[str, np.ndarray]]:
    """Deterministic CV indices (reference ``stonkgs_finetuning.py:53-89``).

    If the dataset exceeds ``max_dataset_size``, it is first cut down with a
    stratified deterministic subsample; then (non-stratified) shuffled
    KFold. ``n_splits=1`` returns only the first of 5 folds."""
    from sklearn.model_selection import KFold, StratifiedShuffleSplit

    idx = np.arange(len(labels))
    if len(labels) > max_dataset_size:
        splitter = StratifiedShuffleSplit(
            n_splits=1, train_size=max_dataset_size, random_state=random_seed
        )
        keep, _ = next(splitter.split(idx.reshape(-1, 1), labels))
        idx = idx[keep]
        labels = labels[keep]

    skf = KFold(
        n_splits=5 if n_splits == 1 else n_splits,
        random_state=random_seed, shuffle=True,
    )
    result = [
        {"train_idx": idx[tr], "test_idx": idx[te]}
        for tr, te in skf.split(idx.reshape(-1, 1), labels)
    ]
    return [result[0]] if n_splits == 1 else result


def weighted_f1(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """sklearn weighted-average F1 (the reference's benchmark metric)."""
    from sklearn.metrics import f1_score

    return float(f1_score(y_true, y_pred, average="weighted"))


@dataclasses.dataclass
class FinetuneConfig:
    """Defaults = the reference CLI (``stonkgs_finetuning.py:516-546``)."""

    epochs: int = 5
    lr: float = 5e-5
    batch_size: int = 8
    gradient_accumulation: int = 1
    cv: int = 5
    max_dataset_size: int = 100_000
    max_grad_norm: float = 1.0
    seed: int = 42
    compute_dtype: str = "bfloat16"
    eval_batch_size: int = 64
    # "auto" = flash attention + selective remat on TPU (see
    # train.pretraining.resolve_train_impl)
    remat: str = "auto"
    attention_impl: str = "auto"


def encode_labels(labels_str) -> tuple[np.ndarray, dict, dict]:
    """String labels -> ints (reference ``stonkgs_finetuning.py:384-388``)."""
    unique_tags = set(labels_str)
    tag2id = {label: number for number, label in enumerate(unique_tags)}
    id2tag = {v: k for k, v in tag2id.items()}
    return np.array([tag2id[x] for x in labels_str], np.int64), tag2id, id2tag


def train_classifier(
    cfg: STonKGsConfig,
    pretrained_params: dict,
    train_features: Dict[str, np.ndarray],
    run_cfg: FinetuneConfig,
    *,
    mesh=None,
    rng_seed: int = 0,
    loss_fn=None,
    trunk_cfg=None,
):
    """Train a classifier head (+ full trunk) on preprocessed features.

    ``loss_fn`` defaults to the STonKGs classification loss; pass
    ``protstonkgs.classification_loss`` for the tri-modality variant
    (``trunk_cfg`` then selects the config carrying hidden_size)."""
    n = len(train_features["input_ids"])
    # folds smaller than one (accumulated) batch still train: fall back
    # to a single full-dataset batch per step (the reference's HF Trainer
    # likewise trains on partial batches)
    batch_size = run_cfg.batch_size
    accumulation = run_cfg.gradient_accumulation
    if n < batch_size * accumulation:
        # shrink ACCUMULATION first so the configured micro-batch (the
        # activation-memory bound) is never exceeded; only folds smaller
        # than one micro-batch fall back to a single smaller batch
        batch_size = min(batch_size, n)
        accumulation = max(n // batch_size, 1)
    steps_per_epoch = max(n // (batch_size * accumulation), 1)
    total_steps = steps_per_epoch * run_cfg.epochs

    # fresh buffer copies: the train step donates its input state, which
    # would otherwise invalidate the shared pretrained arrays across folds
    params = jax.tree.map(jnp.array, pretrained_params)
    params["classifier"] = init_classifier_head(
        jax.random.PRNGKey(rng_seed + 1),
        trunk_cfg if trunk_cfg is not None else cfg.bert,
        cfg.num_labels,
    )
    if mesh is not None:
        from stonkgs_tpu.parallel.mesh import shard_params
        params = shard_params(params, mesh)

    tx = make_optimizer(
        params, learning_rate=run_cfg.lr, total_steps=total_steps,
        max_grad_norm=run_cfg.max_grad_norm,
    )
    state = init_train_state(params, tx, seed=rng_seed)
    if loss_fn is None:
        from stonkgs_tpu.parallel import tp
        from stonkgs_tpu.train.pretraining import resolve_train_impl

        remat, attention_impl = resolve_train_impl(
            run_cfg.remat, run_cfg.attention_impl, mesh)
        loss_fn = partial(stonkgs.classification_loss, remat=remat,
                          attention_impl=attention_impl,
                          tp_mesh=mesh if tp.has_model_axis(mesh) else None)
    step_fn = make_train_step(
        cfg, tx,
        loss_fn=loss_fn,
        compute_dtype=getattr(jnp, run_cfg.compute_dtype),
        grad_accumulation_steps=accumulation,
        mesh=mesh,
    )
    it = data_iterator(
        train_features,
        batch_size * accumulation,
        seed=rng_seed,
    )
    if mesh is not None:
        from stonkgs_tpu.parallel.mesh import shard_batch

        place = lambda b: shard_batch(b, mesh)  # noqa: E731
    else:
        place = jax.device_put
    from stonkgs_tpu.train.pretraining import _prefetch_to_device

    metrics = {}
    for batch in _prefetch_to_device(it, place, total_steps):
        state, metrics = step_fn(state, batch)
    return state, {k: float(v) for k, v in jax.device_get(metrics).items()}


# jitted eval forwards keyed by (logits_fn, cfg, dtype): a fresh jax.jit
# per call would recompile the identical graph once per CV fold.  Bounded
# LRU eviction (hits move to the end): callers passing a fresh closure per
# call recompile anyway, but their churn must not evict warm entries for
# stable callers — ``logits_fn`` should be a stable callable to hit.
_PREDICT_CACHE: dict = {}
_PREDICT_CACHE_MAX = 16


def predict(
    cfg: STonKGsConfig,
    params: dict,
    features: Dict[str, np.ndarray],
    *,
    batch_size: int = 64,
    compute_dtype=jnp.bfloat16,
    logits_fn=None,
) -> np.ndarray:
    """Batched logits over a feature set (padded final batch)."""
    from stonkgs_tpu.utils.batching import batched_apply

    base = logits_fn if logits_fn is not None else stonkgs.classification_logits
    key = (base, cfg, jnp.dtype(compute_dtype).name)
    fn = _PREDICT_CACHE.get(key)
    if fn is not None:
        # LRU: refresh on hit so closure-per-call churn evicts itself,
        # not the warm entries of stable callers
        _PREDICT_CACHE.pop(key)
        _PREDICT_CACHE[key] = fn
    else:
        while len(_PREDICT_CACHE) >= _PREDICT_CACHE_MAX:
            _PREDICT_CACHE.pop(next(iter(_PREDICT_CACHE)))
        fn = _PREDICT_CACHE[key] = jax.jit(
            partial(base, cfg=cfg, compute_dtype=compute_dtype))
    return batched_apply(
        lambda chunk: fn(params, batch=chunk), features,
        ("input_ids", "attention_mask", "token_type_ids"), batch_size)


def run_sequence_classification_cv(
    features: Dict[str, np.ndarray],
    labels_str,
    pretrained_params: dict,
    cfg: STonKGsConfig,
    run_cfg: Optional[FinetuneConfig] = None,
    *,
    task_name: str = "",
    output_dir: Optional[str] = None,
    logger: Optional[RunLogger] = None,
    mesh=None,
    loss_fn=None,
    logits_fn=None,
    trunk_cfg=None,
) -> Dict[str, float]:
    """Cross-validated fine-tuning; returns mean/std weighted F1.

    ``features`` come from ``data.preprocessing.preprocess_for_finetuning``;
    the reference's label encoding / per-fold flow is preserved
    (``stonkgs_finetuning.py:349-513``).  ``loss_fn``/``logits_fn``/
    ``trunk_cfg`` switch the model family (ProtSTonKGs)."""
    run_cfg = run_cfg or FinetuneConfig()
    labels, tag2id, id2tag = encode_labels(list(labels_str))
    cfg = cfg.replace(num_labels=len(tag2id))

    splits = get_train_test_splits(
        labels, random_seed=run_cfg.seed, n_splits=run_cfg.cv,
        max_dataset_size=run_cfg.max_dataset_size,
    )

    f1_scores = []
    rows = []
    state = None
    for fold, indices in enumerate(splits):
        tr, te = indices["train_idx"], indices["test_idx"]
        train_feats = {k: v[tr] for k, v in features.items()
                       if k != "labels"}
        train_feats["labels"] = labels[tr]
        state, train_metrics = train_classifier(
            cfg, pretrained_params, train_feats, run_cfg,
            mesh=mesh, rng_seed=run_cfg.seed + fold,
            loss_fn=loss_fn, trunk_cfg=trunk_cfg,
        )
        test_feats = {k: v[te] for k, v in features.items() if k != "labels"}
        logits = predict(
            cfg, state.params, test_feats,
            batch_size=run_cfg.eval_batch_size,
            compute_dtype=getattr(jnp, run_cfg.compute_dtype),
            logits_fn=logits_fn,
        )
        pred = logits.argmax(axis=1)
        f1 = weighted_f1(labels[te], pred)
        f1_scores.append(f1)
        rows.append((fold, te, pred, labels[te]))
        if logger:
            logger.log_param("label dict", str(tag2id))
            logger.log_param("training dataset size", len(tr))
            logger.log_param("training class dist", str(Counter(labels[tr].tolist())))
            logger.log_param("test dataset size", len(te))
            logger.log_metric("f1_score_weighted", f1, step=fold)

    result = {
        "f1_score_mean": float(np.mean(f1_scores)),
        "f1_score_std": float(np.std(f1_scores)),
    }
    if logger:
        logger.log_param("task name", task_name)
        logger.log_metrics(result)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        import pandas as pd

        result_df = pd.concat([
            pd.DataFrame({
                "split": fold,
                "index": te.tolist(),
                "predicted_label": [id2tag[p] for p in pred.tolist()],
                "true_label": [id2tag[t] for t in true.tolist()],
            })
            for fold, te, pred, true in rows
        ], ignore_index=True)
        result_df.to_csv(
            os.path.join(output_dir,
                         f"predicted_labels_stonkgs_{task_name}df.tsv"),
            sep="\t", index=False,
        )
        # save the last fold's model like the reference
        # (``trainer.save_model``, stonkgs_finetuning.py:501); only the
        # STonKGs family has an HF exporter
        if state is not None and trunk_cfg is None:
            try:
                from stonkgs_tpu.utils.hf_export import save_pretrained

                save_pretrained(
                    state.params, cfg,
                    os.path.join(output_dir, task_name or "model"))
            except Exception as e:  # export is best-effort
                import logging

                logging.getLogger(__name__).warning(
                    "could not export fine-tuned model: %s", e)
    return result
