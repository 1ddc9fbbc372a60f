"""Tensor-parallel lowerings for the KG table and vocabulary decoders.

Assigning ``P("model", None)`` to the KG embedding table and
``P(None, "model")`` to the MLM/ELM decoder kernels (``parallel.mesh``)
makes the *storage* sharded, but GSPMD cannot partition a plain
``jnp.take``/slice against those shardings: it falls back to
replicate-then-partition ("[SPMD] Involuntary full rematerialization"),
i.e. an all-gather of the full (kg_vocab, H) table — ~300 MB per step at
production scale.  This module provides the explicit ``shard_map``
lowerings that keep every shard local:

  * ``tp_gather``    — embedding lookup: each model shard gathers the ids
    that fall into its row range (others contribute zeros) and one
    ``psum(B, L, H)`` over the model axis combines them — the standard
    TP embedding pattern.
  * ``tp_masked_cross_entropy`` — vocabulary-sharded decoder + loss: each
    shard computes its local (B, K, V/n) logits, the global logsumexp is
    assembled from a ``pmax``/``psum`` pair, and the label logit comes
    from a local masked lookup + ``psum`` — the full (B, K, V) logits
    never materialize anywhere, replicated *or* sharded.

Both are differentiable (shard_map transposes the collectives), honor the
vocab padding from ``mesh.pad_params_for_mesh`` (padded rows/columns are
masked out), and degrade to the dense math when the mesh has no model
axis.

Reference being one-upped: the per-token Python dict loop at
``/root/reference/src/stonkgs/models/stonkgs_model.py:182-189`` and dense
(B, S, vocab) decoder logits at ``:217-245``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from stonkgs_tpu.ops.losses import IGNORE_INDEX
from stonkgs_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

Array = jax.Array


@jax.custom_jvp
def _pmax_const(x: Array) -> Array:
    """pmax over the model axis, treated as a constant under autodiff.

    Used only as the max-shift in a logsumexp, whose value is
    shift-invariant — a zero tangent keeps the gradient the exact
    softmax (lax.pmax itself has no differentiation rule).
    """
    return jax.lax.pmax(x, MODEL_AXIS)


@_pmax_const.defjvp
def _pmax_const_jvp(primals, tangents):
    (x,) = primals
    return _pmax_const(x), jnp.zeros_like(x)


def has_model_axis(mesh: Optional[Mesh]) -> bool:
    return (
        mesh is not None
        and MODEL_AXIS in mesh.shape
        and mesh.shape[MODEL_AXIS] > 1
    )


def tp_gather(table: Array, ids: Array, mesh: Mesh) -> Array:
    """Row-sharded embedding lookup: (Vp, H) x (B, L) -> (B, L, H).

    ``table`` is sharded ``P(model, None)`` (rows padded to a multiple of
    the model-axis size); ``ids`` is data-sharded.  Each shard gathers
    in-range ids locally and zeros the rest; one psum over ``model``
    yields the replicated result — no full-table all-gather.
    """

    def local(tbl: Array, idx: Array) -> Array:
        rows = tbl.shape[0]
        lo = jax.lax.axis_index(MODEL_AXIS) * rows
        rel = idx - lo
        in_range = (rel >= 0) & (rel < rows)
        safe = jnp.clip(rel, 0, rows - 1)
        out = jnp.take(tbl, safe, axis=0)
        out = jnp.where(in_range[..., None], out, 0)
        return jax.lax.psum(out, MODEL_AXIS)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,
    )(table, ids)


def tp_masked_cross_entropy(
    kernel: Array,       # (H, Vp) decoder kernel, sharded P(None, model)
    hidden: Array,       # (B, K, H) transformed hidden states, data-sharded
    labels: Array,       # (B, K) int labels, IGNORE_INDEX to skip
    true_vocab: int,     # unpadded vocabulary size
    mesh: Mesh,
) -> Array:
    """Vocab-parallel decode + mean masked cross entropy (fp32).

    Semantics match ``ops.losses.masked_cross_entropy`` over
    ``hidden @ kernel[:, :true_vocab]`` — pinned by
    ``tests/test_tp_sharding.py`` — but each shard only ever holds its
    (B, K, V/n) logit slice.
    """

    def local(w: Array, x: Array, y: Array):
        vloc = w.shape[1]
        lo = jax.lax.axis_index(MODEL_AXIS) * vloc
        logits = jnp.einsum(
            "bkh,hv->bkv", x, w.astype(x.dtype)
        ).astype(jnp.float32)
        # padded decoder columns must not enter the logsumexp
        col_ok = lo + jnp.arange(vloc) < true_vocab
        logits = jnp.where(col_ok[None, None, :], logits, -jnp.inf)
        # global logsumexp: max-shift with a constant (the value is
        # shift-invariant, so the gradient stays exact softmax)
        gmax = _pmax_const(jnp.max(jax.lax.stop_gradient(logits), axis=-1))
        sumexp = jnp.sum(jnp.exp(logits - gmax[..., None]), axis=-1)
        lse = gmax + jnp.log(jax.lax.psum(sumexp, MODEL_AXIS))
        # label logit: local masked lookup, combined by psum
        rel = y - lo
        in_range = (rel >= 0) & (rel < vloc)
        safe = jnp.clip(rel, 0, vloc - 1)
        tgt = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        tgt = jax.lax.psum(jnp.where(in_range, tgt, 0.0), MODEL_AXIS)
        return lse, tgt

    safe_labels = jnp.where(labels != IGNORE_INDEX, labels, 0)
    lse, target = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(DATA_AXIS, None, None),
                  P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False,
    )(kernel, hidden, safe_labels)

    valid = (labels != IGNORE_INDEX).astype(jnp.float32)
    total = jnp.sum((lse - target) * valid)
    return total / jnp.maximum(jnp.sum(valid), 1.0)


def tp_decode_cross_entropy(
    head_params: dict,
    hidden: Array,
    labels: Array,
    segment: str,
    true_vocab: int,
    mesh: Mesh,
) -> Array:
    """ELM-head segment decode + loss through the TP lowering.

    ``hidden`` must already be transformed (``heads.elm_transform``); the
    decoder is bias-free by reference fidelity (``models.heads``).
    """
    return tp_masked_cross_entropy(
        head_params[f"{segment}_decoder"]["kernel"],
        hidden, labels, true_vocab, mesh,
    )
