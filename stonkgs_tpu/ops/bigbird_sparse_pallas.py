"""Pallas TPU kernels for BigBird block-sparse attention (fwd + custom VJP).

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
(plain dense rows) run in XLA outside the kernel — and through plain XLA
autodiff in the backward.

Training: the middle blocks carry a **custom VJP** whose backward pass is
a second Pallas kernel. It recomputes the (bs, (5+r)·bs) probabilities
from the saved per-row logsumexp and scatter-accumulates dK/dV directly
into VMEM-resident (S, D) accumulators at the window/global/random block
offsets — the gathered-key cotangents never round-trip through HBM, and
no O(S·(5+r)·bs) softmax residuals are stored. This replaces the XLA
block-sparse path for ProtSTonKGs *training* as well as inference.

Gradient caveats: no gradient flows to ``attention_mask`` (it derives from
integer inputs at every call site) or to the static ``rand_attn`` plan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stonkgs_tpu.ops.bigbird_sparse import ATTN_PENALTY


def _gather_kv(rand_ref, k_ref, v_ref, kc, vc, j, h, S, bs, r):
    """Assemble the sparse key set [g0 | window(3) | g_last | rand(r)].

    Dynamic offsets land on the sublane dim of (S, D) refs: multiples of
    the 64-token block size satisfy Mosaic's 8-alignment requirement."""
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


def _mid_logits(q_ref, gmask_ref, kc, D, compute_dtype):
    """(bs, (5+r)·bs) masked logits, mirroring the XLA impl's rounding:
    the QK product lands in compute dtype, scale + mask + softmax in fp32."""
    qb = q_ref[0]
    logits = jax.lax.dot_general(
        qb, kc[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rsqrt_d = 1.0 / (D ** 0.5)
    logits = (logits.astype(compute_dtype) * rsqrt_d).astype(jnp.float32)
    return logits + (1.0 - gmask_ref[0, 0, 0][None, :]) * ATTN_PENALTY


def _mid_blocks_kernel(
    rand_ref,    # (H, nb-2, r) int32, SMEM
    q_ref,       # (1, bs, D)          VMEM — query block j+1
    k_ref,       # (1, S, D)           VMEM — full key slice for this (b, h)
    v_ref,       # (1, S, D)           VMEM
    gmask_ref,   # (1, 1, 1, (5+r)*bs) VMEM f32 — gathered key mask, slot-fixed
    out_ref,     # (1, bs, D)          VMEM
    lse_ref,     # (1, bs, 1)          VMEM f32
    kc,          # ((5+r)*bs, D)       VMEM scratch — gathered keys
    vc,          # ((5+r)*bs, D)       VMEM scratch — gathered values
    *,
    H: int, S: int, bs: int, r: int, compute_dtype,
):
    j = pl.program_id(1)
    h = jax.lax.rem(pl.program_id(0), H)
    D = q_ref.shape[-1]
    _gather_kv(rand_ref, k_ref, v_ref, kc, vc, j, h, S, bs, r)
    logits = _mid_logits(q_ref, gmask_ref, kc, D, compute_dtype)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    lse_ref[0] = m + jnp.log(denom)
    w = (e / denom).astype(compute_dtype)
    ctx = jax.lax.dot_general(
        w, vc[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = ctx.astype(out_ref.dtype)


def _mid_blocks_bwd_kernel(
    rand_ref,    # (H, nb-2, r) int32, SMEM
    q_ref,       # (1, bs, D)
    k_ref,       # (1, S, D)
    v_ref,       # (1, S, D)
    gmask_ref,   # (1, 1, 1, W)
    o_ref,       # (1, bs, D)  — saved forward output block
    lse_ref,     # (1, bs, 1)
    do_ref,      # (1, bs, D)
    dq_ref,      # (1, bs, D)
    dk_ref,      # (1, S, D) f32 — accumulated across j (revisited block)
    dv_ref,      # (1, S, D) f32
    kc, vc,      # scratch
    *,
    H: int, S: int, bs: int, r: int, compute_dtype,
):
    j = pl.program_id(1)
    h = jax.lax.rem(pl.program_id(0), H)
    D = q_ref.shape[-1]
    rsqrt_d = 1.0 / (D ** 0.5)
    _gather_kv(rand_ref, k_ref, v_ref, kc, vc, j, h, S, bs, r)
    logits = _mid_logits(q_ref, gmask_ref, kc, D, compute_dtype)
    p = jnp.exp(logits - lse_ref[0])             # (bs, W) probabilities

    do = do_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(                     # do @ vc^T: (bs, W)
        do, vc[:].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    row = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = (p * (dp - row)) * rsqrt_d               # d(qk^T)

    qb = q_ref[0].astype(jnp.float32)
    dq_ref[0] = jax.lax.dot_general(
        ds, kc[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)

    dkc = jax.lax.dot_general(                    # ds^T @ qb: (W, D)
        ds, qb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dvc = jax.lax.dot_general(                    # p^T @ do: (W, D)
        p.astype(compute_dtype).astype(jnp.float32), do,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    # scatter-accumulate the gathered-slot cotangents back to block offsets
    dk_ref[0, 0:bs] += dkc[0:bs]
    dv_ref[0, 0:bs] += dvc[0:bs]
    win = pl.ds(j * bs, 3 * bs)
    dk_ref[0, win] += dkc[bs: 4 * bs]
    dv_ref[0, win] += dvc[bs: 4 * bs]
    dk_ref[0, S - bs: S] += dkc[4 * bs: 5 * bs]
    dv_ref[0, S - bs: S] += dvc[4 * bs: 5 * bs]
    for t in range(r):
        rb = rand_ref[h, j, t]
        sl = pl.ds(rb * bs, bs)
        dk_ref[0, sl] += dkc[(5 + t) * bs: (6 + t) * bs]
        dv_ref[0, sl] += dvc[(5 + t) * bs: (6 + t) * bs]


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


def _mid_specs(H, S, D, bs, W):
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                   # rand
        pl.BlockSpec((1, bs, D), lambda bh, j: (bh, j + 1, 0)),  # q
        pl.BlockSpec((1, S, D), lambda bh, j: (bh, 0, 0)),       # k
        pl.BlockSpec((1, S, D), lambda bh, j: (bh, 0, 0)),       # v
        pl.BlockSpec((1, 1, 1, W), lambda bh, j: (bh, j, 0, 0)),  # gmask
    ]
    return in_specs


def _mid_call_fwd(qf, kf, vf, rand_attn, gmask, bs, interpret):
    BH, S, D = qf.shape
    H, n_mid, r = rand_attn.shape
    W = (5 + r) * bs
    kernel = functools.partial(
        _mid_blocks_kernel, H=H, S=S, bs=bs, r=r, compute_dtype=qf.dtype)
    return pl.pallas_call(
        kernel,
        grid=(BH, n_mid),
        in_specs=_mid_specs(H, S, D, bs, W),
        out_specs=[
            pl.BlockSpec((1, bs, D), lambda bh, j: (bh, j, 0)),
            pl.BlockSpec((1, bs, 1), lambda bh, j: (bh, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, n_mid * bs, D), qf.dtype),
            jax.ShapeDtypeStruct((BH, n_mid * bs, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, D), qf.dtype),
            pltpu.VMEM((W, D), qf.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * n_mid * bs * W * D,
            bytes_accessed=BH * (2 * S * D + n_mid * 2 * bs * D)
            * qf.dtype.itemsize,
            transcendentals=BH * n_mid * bs * W,
        ),
        interpret=interpret,
    )(rand_attn, qf, kf, vf, gmask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mid_blocks(qf, kf, vf, rand_attn, gmask, bs, interpret):
    """Middle-query-block sparse attention: (BH, (nb-2)*bs, D) context."""
    ctx, _ = _mid_call_fwd(qf, kf, vf, rand_attn, gmask, bs, interpret)
    return ctx


def _mid_blocks_fwd(qf, kf, vf, rand_attn, gmask, bs, interpret):
    ctx, lse = _mid_call_fwd(qf, kf, vf, rand_attn, gmask, bs, interpret)
    return ctx, (qf, kf, vf, rand_attn, gmask, ctx, lse)


def _mid_blocks_bwd(bs, interpret, res, g):
    qf, kf, vf, rand_attn, gmask, ctx, lse = res
    BH, S, D = qf.shape
    H, n_mid, r = rand_attn.shape
    W = (5 + r) * bs
    kernel = functools.partial(
        _mid_blocks_bwd_kernel, H=H, S=S, bs=bs, r=r, compute_dtype=qf.dtype)
    dq_mid, dk, dv = pl.pallas_call(
        kernel,
        grid=(BH, n_mid),
        in_specs=_mid_specs(H, S, D, bs, W) + [
            pl.BlockSpec((1, bs, D), lambda bh, j: (bh, j, 0)),   # o
            pl.BlockSpec((1, bs, 1), lambda bh, j: (bh, j, 0)),   # lse
            pl.BlockSpec((1, bs, D), lambda bh, j: (bh, j, 0)),   # do
        ],
        out_specs=[
            pl.BlockSpec((1, bs, D), lambda bh, j: (bh, j, 0)),   # dq (mid)
            pl.BlockSpec((1, S, D), lambda bh, j: (bh, 0, 0)),    # dk
            pl.BlockSpec((1, S, D), lambda bh, j: (bh, 0, 0)),    # dv
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, n_mid * bs, D), qf.dtype),
            jax.ShapeDtypeStruct((BH, S, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, S, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, D), qf.dtype),
            pltpu.VMEM((W, D), qf.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * BH * n_mid * bs * W * D,
            bytes_accessed=BH * (4 * S * D + n_mid * 4 * bs * D) * 4,
            transcendentals=BH * n_mid * bs * W,
        ),
        interpret=interpret,
    )(rand_attn, qf, kf, vf, gmask, ctx, lse, g.astype(qf.dtype))
    # mid-block dq covers query rows [bs, S-bs); first/last rows get theirs
    # from the XLA dense path outside
    dqf = jnp.pad(dq_mid, ((0, 0), (bs, bs), (0, 0)))
    return (dqf, dk.astype(kf.dtype), dv.astype(vf.dtype),
            np.zeros(rand_attn.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(gmask))


_mid_blocks.defvjp(_mid_blocks_fwd, _mid_blocks_bwd)


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
    """(B, H, S, D) context, bit-compatible with ``block_sparse_attention``.

    Differentiable in q/k/v (Pallas custom VJP for the middle blocks, XLA
    autodiff for the dense first/last rows); no mask/plan gradients.
    """
    B, H, S, D = q.shape
    bs = block_size
    nb = S // bs
    r = int(rand_attn.shape[-1])
    n_mid = nb - 2
    assert n_mid >= 1 and nb >= 5, "use the XLA path for short sequences"
    BH = B * H
    f = jnp.promote_types(q.dtype, jnp.float32)

    qf = q.reshape(BH, S, D)
    kf = k.reshape(BH, S, D)
    vf = v.reshape(BH, S, D)
    mask = attention_mask.astype(jnp.float32)          # (B, S)
    rand_attn = jnp.asarray(rand_attn, jnp.int32)
    gmask = _gathered_key_mask(mask, rand_attn, nb, bs)

    ctx_mid = _mid_blocks(qf, kf, vf, rand_attn, gmask, bs, interpret)

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
