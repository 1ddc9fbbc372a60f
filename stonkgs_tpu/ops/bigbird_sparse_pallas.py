"""Pallas TPU kernel for BigBird block-sparse attention (inference path).

Same semantics as ``ops.bigbird_sparse.block_sparse_attention`` (HF
``BigBirdBlockSparseAttention``, the ProtSTonKGs trunk — reference
``/root/reference/src/stonkgs/models/protstonkgs_model.py:137``), but
without the XLA lowering's HBM-materialized gather/concat intermediates
(banded keys, (5+r)·bs logits, ...) that made the jnp version ~16% of MXU
peak and HBM-bound (PERF.md round 1).

Kernel shape: grid ``(B*H, nb-2)`` over the middle query blocks. Per
program, the full per-(batch,head) K/V slices live in VMEM (S·D·2 bytes =
0.5 MB each at 4096x64 bf16) and stay resident while the query-block index
varies (the innermost grid dimension), so the sparse key set — global
first/last + 3-block window + r random blocks — is assembled by cheap
VMEM-to-VMEM slices into one contiguous (5+r)·bs key/value matrix and hits
the MXU as a single (bs, D) x (D, (5+r)·bs) matmul + softmax + context
matmul. No branching: the HF special cases for query blocks 1 and nb-2
(which drop the duplicate window copy of a global block) are expressed by
zeroing the duplicate slot in the key mask. The key mask itself is
gathered OUTSIDE the kernel (it is tiny — B·H·(nb-2)·(5+r)·bs floats —
and Mosaic requires 128-aligned dynamic lane offsets, which block-size-64
mask slices inside the kernel cannot satisfy). The first/last query blocks
(plain dense rows) run in XLA outside the kernel.

The kernel is forward-only (inference); the training/grad path keeps the
differentiable XLA implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stonkgs_tpu.ops.bigbird_sparse import ATTN_PENALTY


def _mid_blocks_kernel(
    rand_ref,    # (H, nb-2, r) int32, SMEM
    q_ref,       # (1, bs, D)          VMEM — query block j+1
    k_ref,       # (1, S, D)           VMEM — full key slice for this (b, h)
    v_ref,       # (1, S, D)           VMEM
    gmask_ref,   # (1, 1, 1, (5+r)*bs) VMEM f32 — gathered key mask, slot-fixed
    out_ref,     # (1, bs, D)          VMEM
    kc,          # ((5+r)*bs, D)       VMEM scratch — gathered keys
    vc,          # ((5+r)*bs, D)       VMEM scratch — gathered values
    *,
    H: int, S: int, bs: int, r: int, compute_dtype,
):
    j = pl.program_id(1)
    h = jax.lax.rem(pl.program_id(0), H)
    D = q_ref.shape[-1]

    # --- assemble the sparse key set: [g0 | window(3) | g_last | rand(r)]
    # (dynamic offsets land on the sublane dim of (S, D) refs: multiples of
    # the 64-token block size satisfy Mosaic's 8-alignment requirement)
    kc[0:bs] = k_ref[0, 0:bs]
    vc[0:bs] = v_ref[0, 0:bs]
    win = pl.ds(j * bs, 3 * bs)          # blocks i-1, i, i+1 for i = j+1
    kc[bs: 4 * bs] = k_ref[0, win]
    vc[bs: 4 * bs] = v_ref[0, win]
    kc[4 * bs: 5 * bs] = k_ref[0, S - bs: S]
    vc[4 * bs: 5 * bs] = v_ref[0, S - bs: S]
    for t in range(r):
        rb = rand_ref[h, j, t]
        sl = pl.ds(rb * bs, bs)
        kc[(5 + t) * bs: (6 + t) * bs] = k_ref[0, sl]
        vc[(5 + t) * bs: (6 + t) * bs] = v_ref[0, sl]

    # --- attention over the gathered set (one MXU matmul each way)
    qb = q_ref[0]
    logits = jax.lax.dot_general(
        qb, kc[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # mirror the XLA impl's rounding: QK product lands in compute dtype,
    # the scale + mask + softmax run in fp32
    rsqrt_d = 1.0 / (D ** 0.5)
    logits = (logits.astype(compute_dtype) * rsqrt_d).astype(jnp.float32)
    logits = logits + (1.0 - gmask_ref[0, 0, 0][None, :]) * ATTN_PENALTY
    w = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
    ctx = jax.lax.dot_general(
        w, vc[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = ctx.astype(out_ref.dtype)


def _gathered_key_mask(mask, rand_attn, nb, bs):
    """(B, S) 0/1 mask -> (B*H, nb-2, (5+r)*bs) f32 per-slot key mask.

    Slot layout [g0 | window(3) | g_last | rand(r)]; the duplicate window
    copies of the global blocks at query blocks 1 and nb-2 are zeroed
    (HF's edge special cases, ``bigbird_sparse.block_sparse_attention``
    parts 2/4)."""
    B = mask.shape[0]
    H, n_mid, r = rand_attn.shape
    bmask = mask.reshape(B, nb, bs)
    j = jnp.arange(n_mid)
    fixed = jnp.stack([
        jnp.zeros((n_mid,), jnp.int32),           # g0
        j, j + 1, j + 2,                          # window (i-1, i, i+1)
        jnp.full((n_mid,), nb - 1, jnp.int32),    # g_last
    ], axis=-1)                                   # (n_mid, 5)
    idx = jnp.concatenate(
        [jnp.broadcast_to(fixed, (H, n_mid, 5)), rand_attn], axis=-1
    )                                             # (H, n_mid, 5+r)
    g = bmask[:, idx]                             # (B, H, n_mid, 5+r, bs)
    # zero the duplicate-slot copies at the edges
    g = g.at[:, :, 0, 1].set(0.0)                 # query block 1: w==g0
    g = g.at[:, :, n_mid - 1, 3].set(0.0)         # query block nb-2: w==glast
    # trailing singleton sublane dim: Mosaic block dims must be full-size
    # or tile-aligned, so the per-program block is (1, 1, 1, W)
    return g.reshape(B * H, n_mid, 1, (5 + r) * bs)


def block_sparse_attention_pallas(
    q: jnp.ndarray,               # (B, H, S, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    rand_attn: jnp.ndarray,       # (H, nb-2, r) int32
    attention_mask: jnp.ndarray,  # (B, S) float 0/1
    block_size: int,
    precision=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, S, D) context, bit-compatible with ``block_sparse_attention``."""
    B, H, S, D = q.shape
    bs = block_size
    nb = S // bs
    r = int(rand_attn.shape[-1])
    n_mid = nb - 2
    assert n_mid >= 1 and nb >= 5, "use the XLA path for short sequences"
    BH = B * H
    W = (5 + r) * bs
    f = jnp.promote_types(q.dtype, jnp.float32)

    qf = q.reshape(BH, S, D)
    kf = k.reshape(BH, S, D)
    vf = v.reshape(BH, S, D)
    mask = attention_mask.astype(jnp.float32)          # (B, S)
    rand_attn = jnp.asarray(rand_attn, jnp.int32)
    gmask = _gathered_key_mask(mask, rand_attn, nb, bs)

    kernel = functools.partial(
        _mid_blocks_kernel,
        H=H, S=S, bs=bs, r=r, compute_dtype=q.dtype,
    )
    ctx_mid = pl.pallas_call(
        kernel,
        grid=(BH, n_mid),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # rand
            pl.BlockSpec((1, bs, D), lambda bh, j: (bh, j + 1, 0)),  # q
            pl.BlockSpec((1, S, D), lambda bh, j: (bh, 0, 0)),       # k
            pl.BlockSpec((1, S, D), lambda bh, j: (bh, 0, 0)),       # v
            pl.BlockSpec((1, 1, 1, W), lambda bh, j: (bh, j, 0, 0)),  # gmask
        ],
        out_specs=pl.BlockSpec((1, bs, D), lambda bh, j: (bh, j, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, n_mid * bs, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((W, D), q.dtype),
            pltpu.VMEM((W, D), q.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * n_mid * bs * W * D,
            bytes_accessed=BH * (2 * S * D + n_mid * 2 * bs * D)
            * q.dtype.itemsize,
            transcendentals=BH * n_mid * bs * W,
        ),
        interpret=interpret,
    )(rand_attn, qf, kf, vf, gmask)

    # --- first/last query blocks: plain dense attention rows (XLA)
    mask_bh = jnp.broadcast_to(mask[:, None], (B, H, S)).reshape(BH, S)
    penalty = ((1.0 - mask_bh) * ATTN_PENALTY)[:, None, :]   # (BH, 1, S)
    rsqrt_d = 1.0 / (D ** 0.5)

    def dense_block(qb):                                      # (BH, bs, D)
        p = jnp.einsum("bqd,bkd->bqk", qb, kf,
                       precision=precision) * rsqrt_d
        w = jax.nn.softmax(p.astype(f) + penalty, axis=-1).astype(q.dtype)
        return jnp.einsum("bqk,bkd->bqd", w, vf, precision=precision)

    ctx_first = dense_block(qf[:, :bs])
    ctx_last = dense_block(qf[:, S - bs:])

    ctx = jnp.concatenate([ctx_first, ctx_mid, ctx_last], axis=1)
    ctx = ctx.reshape(B, H, S, D)
    return ctx * mask[:, None, :, None].astype(ctx.dtype)
