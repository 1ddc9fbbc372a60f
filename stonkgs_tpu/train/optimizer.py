"""Optimizer factory matching HF Trainer semantics.

Reference pre-training uses HF ``TrainingArguments`` defaults
(``/root/reference/src/stonkgs/models/stonkgs_pretraining.py:171-193``):
AdamW (b1=0.9, b2=0.999, eps=1e-8), weight_decay=0.0, linear LR decay from
``lr`` to 0 over ``max_steps`` with 0 warmup, global-norm grad clipping at
1.0.  The LM backbone and KG table are frozen
(``stonkgs_model.py:113-114``); here frozen subtrees get ``set_to_zero``.
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
    tx = optax.chain(*steps)
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()},
        trainable_mask(params, frozen_prefixes),
    )
