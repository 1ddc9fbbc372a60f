"""Multi-head attention ops.

Implementations behind one API:
  * ``impl="xla"`` — einsum softmax attention; XLA fuses it well at seq 512.
  * ``impl="flash"`` — Pallas blockwise flash-attention kernel with a
    custom VJP (``stonkgs_tpu.ops.flash_attention``), used on TPU for long
    sequences (ProtSTonKGs, 4096 tokens) and for training (no S² HBM
    residuals).
  * ``impl=("flash", mesh)`` — the same kernel wrapped in ``shard_map``
    over the mesh's data axis: each shard runs the kernel on its local
    batch (GSPMD has no partitioning rule for the Mosaic custom call), and
    the in-kernel dropout seed is folded with the shard index so masks
    decorrelate across the fleet.

Replaces the reference's reliance on torch ATen attention inside HF BERT
(``/root/reference/src/stonkgs/models/stonkgs_model.py:204-210``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def default_infer_impl() -> str:
    """Attention impl for inference paths ("auto" resolves per seq len)."""
    return "auto"


def resolve_infer_impl(impl: str, seq_len: int):
    """Resolve "auto" to the fastest measured impl for this sequence.

    Measured on v5e (B=128, H=12, D=64, bf16, in-model): the Pallas
    inference flash kernel wins at 512 tokens (trunk 138.7 -> 127.5 ms —
    XLA attention is HBM-bound on score materialization there) but LOSES
    at 256 tokens (backbone 62.0 -> 69.6 ms — the scores are small enough
    that XLA's fusion with the surrounding projections beats the Pallas
    call's fusion barrier + layout transposes).
    """
    if impl != "auto":
        return impl
    if jax.default_backend() == "tpu" and seq_len >= 384:
        return "flash"
    return "xla"


def _sharded_flash(
    mesh, q, k, v, bias, dropout_rate, dropout_rng,
):
    from jax.sharding import PartitionSpec as P

    from stonkgs_tpu.ops.flash_attention import flash_attention_train
    from stonkgs_tpu.parallel.mesh import DATA_AXIS

    batch_spec = P(DATA_AXIS)  # shard dim 0 (batch); replicate the rest
    # materialize optional args so the spec pytrees are static
    if bias is None:
        bias = jnp.zeros((q.shape[0], 1, 1, q.shape[1]), jnp.float32)
    if dropout_rng is None:
        dropout_rate = 0.0  # no rng -> no dropout (matches the other paths)
        dropout_rng = jax.random.PRNGKey(0)

    def local(q, k, v, bias, rng):
        # decorrelate the in-kernel dropout streams across data shards
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        return flash_attention_train(
            q, k, v, bias=bias,
            dropout_rate=dropout_rate, dropout_rng=rng,
        )

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(batch_spec, batch_spec, batch_spec, batch_spec, P()),
        out_specs=batch_spec,
        check_vma=False,
    )(q, k, v, bias, dropout_rng)


def dot_product_attention(
    q: Array,  # (B, S, H, D)
    k: Array,  # (B, S, H, D)
    v: Array,  # (B, S, H, D)
    bias: Optional[Array] = None,  # (B, 1, 1, S) or broadcastable to (B, H, Sq, Sk)
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[Array] = None,
    deterministic: bool = True,
    precision=None,
    impl="xla",
) -> Array:
    """Scaled dot-product attention. Returns (B, S, H, D)."""
    if impl == "auto":
        impl = resolve_infer_impl("auto", q.shape[1])
    if impl == "flash" or (isinstance(impl, tuple) and impl[0] == "flash"):
        rate = 0.0 if deterministic else dropout_rate
        mesh = impl[1] if isinstance(impl, tuple) else None
        if mesh is not None and mesh.size > 1:
            return _sharded_flash(mesh, q, k, v, bias, rate, dropout_rng)
        if deterministic:
            # no dropout and no VJP needed: the bf16-MXU inference kernel
            # (the train kernel upcasts to fp32 and pays quarter-rate MXU).
            # It holds ALL heads' K/V per program, so its scoped-VMEM
            # working set grows with H*S*itemsize — past the measured
            # 16 MB budget (e.g. ProtBERT H=16 S=3072, or fp32 compute at
            # trunk shapes) compilation fails; fall back to the per-head
            # train kernel, which compiles at all shapes in use.
            from stonkgs_tpu.ops.flash_attention import (
                flash_attention_infer,
                infer_kernel_fits,
            )
            _, S, H, D = q.shape
            if infer_kernel_fits(S, H, D, itemsize=q.dtype.itemsize):
                return flash_attention_infer(q, k, v, bias=bias)
        from stonkgs_tpu.ops.flash_attention import flash_attention_train
        return flash_attention_train(
            q, k, v, bias=bias, dropout_rate=rate, dropout_rng=dropout_rng,
        )
    return _xla_attention(
        q, k, v, bias,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        deterministic=deterministic, precision=precision,
    )


def _xla_attention(
    q: Array, k: Array, v: Array, bias: Optional[Array],
    *, dropout_rate: float, dropout_rng: Optional[Array],
    deterministic: bool, precision,
) -> Array:
    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32)).astype(q.dtype)
    # (B, H, Sq, Sk)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k, precision=precision)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    # softmax in >= fp32 for numerical parity with torch
    f = jnp.promote_types(scores.dtype, jnp.float32)
    probs = jax.nn.softmax(scores.astype(f), axis=-1).astype(q.dtype)
    if not deterministic and dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0).astype(probs.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, precision=precision)
