"""Optimizer factory matching HF Trainer semantics.

Reference pre-training uses HF ``TrainingArguments`` defaults
(``/root/reference/src/stonkgs/models/stonkgs_pretraining.py:171-193``):
AdamW (b1=0.9, b2=0.999, eps=1e-8), weight_decay=0.0, linear LR decay from
``lr`` to 0 over ``max_steps`` with 0 warmup, global-norm grad clipping at
1.0.  The LM backbone and KG table are frozen
(``stonkgs_model.py:113-114``); freezing is enforced *structurally*: the
train step differentiates and updates only the trainable subtree
(``split_frozen``), so frozen params never enter grad buffers, the
global-norm clip, or ``apply_updates`` — no zero-tree HBM traffic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import optax

FROZEN_PREFIXES = ("lm_backbone", "kg_backbone", "prot_backbone")


def linear_schedule(
    lr: float, total_steps: int, warmup_steps: int = 0
) -> optax.Schedule:
    """HF 'linear' scheduler: warmup 0->lr then linear decay lr->0."""
    if warmup_steps > 0:
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, warmup_steps),
                optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
            ],
            [warmup_steps],
        )
    return optax.linear_schedule(lr, 0.0, max(total_steps, 1))


def trainable_mask(params, frozen_prefixes: Sequence[str] = FROZEN_PREFIXES):
    """Pytree of 'train'/'frozen' labels by top-level path prefix."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    labels = []
    for path, _ in flat:
        head = str(getattr(path[0], "key", getattr(path[0], "idx", path[0])))
        labels.append("frozen" if head in frozen_prefixes else "train")
    return jax.tree_util.tree_unflatten(treedef, labels)


def split_frozen(params: dict, frozen_prefixes: Sequence[str] = FROZEN_PREFIXES):
    """Split a parameter dict into (trainable, frozen) top-level subtrees.

    The frozen backbones are whole top-level entries, so the split is a
    dict partition.  Keeping frozen params OUT of the grad/optimizer path
    entirely (rather than zeroing their updates with ``set_to_zero``)
    matters for step time: zero-gradient trees for ~190M frozen params
    still cost their HBM round trips through grad init, global-norm
    clipping, and ``apply_updates`` — ~8 GB of pointless traffic per step
    at full scale (PERF.md round-3 optimizer notes).
    """
    train = {k: v for k, v in params.items() if k not in frozen_prefixes}
    frozen = {k: v for k, v in params.items() if k in frozen_prefixes}
    return train, frozen


def merge_frozen(train: dict, frozen: dict) -> dict:
    """Inverse of ``split_frozen`` (dict key order is canonicalized by
    JAX's pytree flattening, so ordering does not matter)."""
    return {**train, **frozen}


def make_optimizer(
    params,
    *,
    learning_rate: float = 1e-4,
    total_steps: int = 10_000,
    warmup_steps: int = 0,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    frozen_prefixes: Sequence[str] = FROZEN_PREFIXES,
) -> optax.GradientTransformation:
    """AdamW chain with HF Trainer defaults.

    ``params``/``frozen_prefixes`` are accepted for signature stability;
    freezing happens structurally in the train step (``split_frozen``) —
    the returned transformation is meant to be initialized and applied on
    the TRAINABLE subtree only (``train.pretraining.init_train_state``).
    """
    del params, frozen_prefixes
    schedule = linear_schedule(learning_rate, total_steps, warmup_steps)
    steps = []
    if max_grad_norm is not None:
        steps.append(optax.clip_by_global_norm(max_grad_norm))
    # HF Trainer excludes biases and LayerNorm weights from weight decay
    # (no-decay group ['bias', 'LayerNorm.weight']); 1-D leaves cover both.
    decay_mask = lambda params: jax.tree.map(  # noqa: E731
        lambda p: getattr(p, "ndim", 0) >= 2, params)
    steps.append(
        optax.adamw(schedule, b1=b1, b2=b2, eps=eps,
                    weight_decay=weight_decay, mask=decay_mask)
    )
    return optax.chain(*steps)
