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
import jax.numpy as jnp
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
    fused: bool = False,
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
    tx = optax.chain(*steps)
    return FusedClippedAdamW(
        tx, schedule=schedule, b1=b1, b2=b2, eps=eps,
        weight_decay=weight_decay, max_grad_norm=max_grad_norm,
        fused=fused,
    )


class FusedClippedAdamW:
    """optax-compatible AdamW with a single-pass fused ``update_and_apply``.

    ``init``/``update`` delegate to the equivalent optax chain (exact
    drop-in, including direct ``tx.update`` callers).  The train step
    instead calls ``update_and_apply(grads, state, params)``: the
    global-norm clip factor is folded into the per-leaf moment update and
    the parameter write happens in the same expression, so the scaled
    gradient tree and the separate updates tree never materialize in HBM —
    one read of (g, m, v, p) and one write of (m, v, p) per leaf, plus the
    unavoidable extra gradient read for the norm.  Semantics are pinned
    against the optax chain by ``tests/test_fused_adamw.py``.
    """

    def __init__(self, tx, *, schedule, b1, b2, eps, weight_decay,
                 max_grad_norm, fused=False):
        self._tx = tx
        self._schedule = schedule
        self.b1, self.b2, self.eps = b1, b2, eps
        self.weight_decay = weight_decay
        self.max_grad_norm = max_grad_norm
        # whether the train step should take the single-pass path; OFF by
        # default — measured equal to the two-pass chain (the update is
        # HBM-floor-bound) while scheduling to a ~165 MB higher peak,
        # which turns the B=64 micro-batch config from fits into OOM
        # (PERF.md round-3 optimizer notes)
        self.use_fused_apply = fused

    def init(self, params):
        """Delegates to the optax chain (state layouts are identical)."""
        return self._tx.init(params)

    def update(self, grads, state, params=None):
        """optax-semantics two-pass update (compatibility path)."""
        return self._tx.update(grads, state, params)

    @staticmethod
    def _is_counted_state(x) -> bool:
        """NamedTuple states carrying a ``count`` field (plain tuples have
        a ``count`` METHOD, so ``hasattr`` alone is a trap)."""
        return "count" in getattr(x, "_fields", ())

    def _counts(self, state):
        """Locate the adam state (count/mu/nu) and the schedule state.

        Matches by shape (``mu`` field present or not) and asserts
        EXACTLY one candidate of each kind: a future chain with an extra
        counted transform (zero_nans, a second schedule) must fail loudly
        here instead of being silently mislabeled by a last-one-wins walk.
        """
        adams = []
        scheds = []
        for s in jax.tree_util.tree_leaves(
                state, is_leaf=self._is_counted_state):
            if not self._is_counted_state(s):
                continue
            (adams if hasattr(s, "mu") else scheds).append(s)
        assert len(adams) == 1 and len(scheds) == 1, (
            f"fused AdamW expects exactly one adam state and one schedule "
            f"state in the chain, found {len(adams)} adam / {len(scheds)} "
            f"schedule-like: {state}")
        return adams[0], scheds[0]

    def update_and_apply(self, grads, state, params):
        """Fused clip + AdamW + apply: returns (new_params, new_state)."""
        adam, sched = self._counts(state)
        assert adam is not None and sched is not None, state
        count = optax.safe_int32_increment(adam.count)
        lr = self._schedule(sched.count)
        if self.max_grad_norm is not None:
            norm = optax.global_norm(grads)
            scale = self.max_grad_norm / jnp.maximum(
                norm, self.max_grad_norm)
        else:
            scale = jnp.float32(1.0)
        bc1 = 1.0 - self.b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - self.b2 ** count.astype(jnp.float32)

        def leaf(g, m, v, p):
            g = g.astype(jnp.float32) * scale
            m2 = self.b1 * m.astype(jnp.float32) + (1.0 - self.b1) * g
            v2 = self.b2 * v.astype(jnp.float32) + (1.0 - self.b2) * jnp.square(g)
            upd = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + self.eps)
            if self.weight_decay and getattr(p, "ndim", 0) >= 2:
                upd = upd + self.weight_decay * p
            # moments keep their STORED dtype (optax mu_dtype follows the
            # param dtype): fp32 math, but no silent opt_state dtype drift
            # vs init()/update() if trainables are ever bf16
            return (m2.astype(m.dtype), v2.astype(v.dtype),
                    (p - lr * upd).astype(p.dtype))

        out = jax.tree.map(leaf, grads, adam.mu, adam.nu, params)
        new_mu = jax.tree.map(lambda t: t[0], out,
                              is_leaf=lambda x: isinstance(x, tuple))
        new_nu = jax.tree.map(lambda t: t[1], out,
                              is_leaf=lambda x: isinstance(x, tuple))
        new_p = jax.tree.map(lambda t: t[2], out,
                             is_leaf=lambda x: isinstance(x, tuple))

        new_adam = adam._replace(count=count, mu=new_mu, nu=new_nu)
        new_sched = sched._replace(
            count=optax.safe_int32_increment(sched.count))
        flat, treedef = jax.tree_util.tree_flatten(
            state, is_leaf=self._is_counted_state)
        flat = [new_adam if s is adam else new_sched if s is sched else s
                for s in flat]
        new_state = jax.tree_util.tree_unflatten(treedef, flat)
        return new_p, new_state
