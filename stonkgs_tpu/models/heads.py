"""Prediction heads for the STonKGs model family.

Reference semantics (``/root/reference/src/stonkgs/models/stonkgs_model.py:
37-73``): the ELM head shares one BERT ``transform`` (dense + gelu +
LayerNorm) and splits the sequence between modality-specific bias-free
decoders.  NOTE (fidelity quirk): the reference *creates* ``text_bias`` /
``entity_bias`` parameters but never applies them in ``forward`` — the
decoders are ``nn.Linear(..., bias=False)`` and the biases are never added.
We keep the parameters in the tree (checkpoints contain them) and likewise
do not apply them.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from stonkgs_tpu.config import BertConfig
from stonkgs_tpu.models.bert import (
    _init_dense, _init_layer_norm, _trunc_normal, activation, dense,
    layer_norm,
)

Array = jax.Array


def init_elm_head(
    key: Array,
    cfg: BertConfig,
    segment_vocab_sizes: Sequence[int],
    segment_names: Sequence[str] = ("text", "entity"),
) -> dict:
    """ELM/PELM head: shared transform + one bias-free decoder per segment."""
    ks = jax.random.split(key, 1 + len(segment_vocab_sizes))
    h, std = cfg.hidden_size, cfg.initializer_range
    p = {
        "transform": {
            "dense": _init_dense(ks[0], h, h, std),
            "layer_norm": _init_layer_norm(h),
        },
    }
    for i, (name, vs) in enumerate(zip(segment_names, segment_vocab_sizes)):
        p[f"{name}_decoder"] = {"kernel": _trunc_normal(ks[1 + i], (h, vs), std)}
        # Unused-by-forward bias parameters, kept for checkpoint fidelity.
        p[f"{name}_bias"] = jnp.zeros((vs,), jnp.float32)
    return p


def elm_transform(p: dict, hidden: Array, cfg: BertConfig, precision=None) -> Array:
    """Shared BertPredictionHeadTransform: dense -> act -> LayerNorm."""
    x = dense(hidden, p["transform"]["dense"], precision)
    x = activation(cfg.hidden_act)(x)
    return layer_norm(x, p["transform"]["layer_norm"], cfg.layer_norm_eps)


def elm_decode_segment(p: dict, transformed: Array, name: str, precision=None) -> Array:
    """Project transformed hidden states onto one segment's vocabulary.

    Bias-free on purpose — see module docstring (reference quirk)."""
    return dense(transformed, p[f"{name}_decoder"], precision)


def elm_head_dense(
    p: dict,
    hidden: Array,              # (B, S, H)
    cfg: BertConfig,
    segment_bounds: Sequence[Tuple[int, int]],
    segment_names: Sequence[str],
    precision=None,
) -> Tuple[Array, ...]:
    """Dense (reference-shaped) head: full logits per segment slice."""
    t = elm_transform(p, hidden, cfg, precision)
    return tuple(
        elm_decode_segment(p, t[:, a:b], name, precision)
        for (a, b), name in zip(segment_bounds, segment_names)
    )


def init_nsp_head(key: Array, cfg: BertConfig) -> dict:
    return _init_dense(key, cfg.hidden_size, 2, cfg.initializer_range)


def nsp_head(p: dict, pooled: Array, precision=None) -> Array:
    return dense(pooled, p, precision)


def init_classifier_head(key: Array, cfg: BertConfig, num_labels: int) -> dict:
    return _init_dense(key, cfg.hidden_size, num_labels, cfg.initializer_range)


def classifier_head(
    p: dict,
    pooled: Array,
    *,
    dropout_prob: float = 0.0,
    dropout_rng: Optional[Array] = None,
    deterministic: bool = True,
    precision=None,
) -> Array:
    """Dropout + linear classification head over the pooled output."""
    if not deterministic and dropout_rng is not None and dropout_prob > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_prob, pooled.shape)
        pooled = jnp.where(keep, pooled / (1.0 - dropout_prob), 0.0).astype(pooled.dtype)
    return dense(pooled, p, precision)
