"""Pallas TPU attention kernels (inference + training).

Blockwise attention for the STonKGs encoders (seq 512 / 260 / 4096,
head_dim 64).  Each grid program computes one query block against the full
key/value sequence, with the softmax reduction done in fp32 in VMEM — one
HBM round trip for q/k/v and none for the (Sq, Sk) score matrix, which is
what dominates HBM traffic in the naive implementation.

Key/value fit comfortably in VMEM at these sequence lengths (4096 x 64 x 4B
= 1 MiB), so no online-softmax accumulation across k blocks is needed:
a single max-subtracted softmax per q block is exact.

``flash_attention`` is the inference kernel.  ``flash_attention_train`` is
the differentiable version: a custom VJP whose backward pass is a second
Pallas kernel that *recomputes* the probability matrix from the saved
(q, k, logsumexp) instead of storing it — the O(B·heads·S²) fp32 softmax
buffers that dominate the training-step HBM footprint never exist, so the
trunk trains WITHOUT rematerialization (reference equivalent:
``gradient_checkpointing`` + stored torch softmax buffers,
``/root/reference/src/stonkgs/models/protstonkgs_model.py:139``).
Attention dropout runs inside the kernels with the TPU PRNG, seeded per
(batch, head, q-block) program so the backward pass regenerates the exact
forward mask.

On non-TPU backends the kernels run in interpret mode (tests) — production
CPU paths should use ``impl="xla"``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def flash_attention(
    q: Array,  # (B, S, H, D)
    k: Array,
    v: Array,
    bias: Optional[Array] = None,  # (B, 1, 1, S) additive key bias
    *,
    block_q: int = 256,
    interpret: Optional[bool] = None,
) -> Array:
    """Attention with softmax over the full key axis. Returns (B, S, H, D).

    Differentiable (custom Pallas VJP); for dropout during training use
    :func:`flash_attention_train`."""
    return flash_attention_train(q, k, v, bias, block_q=block_q,
                                 interpret=interpret)


# ---------------------------------------------------------------------------
# training kernels (custom VJP, in-kernel dropout)
# ---------------------------------------------------------------------------

def _dropout_threshold(rate: float) -> int:
    """uint32 threshold: keep position iff random_bits < threshold."""
    return min(int(round((1.0 - rate) * 2.0 ** 32)), 2 ** 32 - 1)


def _dropout_keep(seed_ref, shape, rate: float):
    """Counter-based keep mask for the current (b, h, q-block) program.

    A murmur3-finalizer hash of the global (row, col) position and the
    seed — stateless, identical on every backend, and regenerated
    bit-exactly by the backward kernel (unlike a stateful PRNG, there is
    no generation-order coupling between kernels).
    """
    b, h, i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    base = ((b * pl.num_programs(1) + h) * pl.num_programs(2) + i) * shape[0]
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (base.astype(jnp.uint32) + r) * jnp.uint32(shape[1]) + c
    x = x ^ seed_ref[0].astype(jnp.uint32)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 16) ^ seed_ref[1].astype(jnp.uint32)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0x27D4EB2F)
    x = x ^ (x >> 16)
    return x < jnp.uint32(_dropout_threshold(rate))


def _train_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref,
                      o_ref, lse_ref, *, scale: float, rate: float):
    # MXU dots run on the INPUT dtype (bf16 in production — full MXU rate;
    # fp32 in CPU tests) with fp32 accumulation; softmax statistics,
    # scaling, and the logsumexp residual stay fp32.
    q = q_ref[0, 0]                              # (bq, D) input dtype
    k = k_ref[0, 0]                              # (S, D)
    v = v_ref[0, 0]                              # (S, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[0, 0]                    # (bq, S) fp32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    lse_ref[0, 0] = m + jnp.log(denom)           # (bq, 1)
    pn = p / denom
    if rate > 0.0:
        keep = _dropout_keep(seed_ref, pn.shape, rate)
        pn = jnp.where(keep, pn * (1.0 / (1.0 - rate)), 0.0)
    o_ref[0, 0] = jax.lax.dot_general(
        pn.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _train_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                      lse_ref, do_ref, dq_ref, dk_ref, dv_ref, db_ref,
                      *, scale: float, rate: float):
    h, i = pl.program_id(1), pl.program_id(2)
    # same dtype discipline as the forward: MXU dots on the input dtype
    # (full-rate bf16 in production), fp32 accumulation everywhere, fp32
    # softmax recompute / rowsum / dS algebra on the VPU
    q = q_ref[0, 0]                              # (bq, D) input dtype
    k = k_ref[0, 0]                              # (S, D)
    v = v_ref[0, 0]                              # (S, D)
    do = do_ref[0, 0]                            # (bq, D)
    lse = lse_ref[0, 0]                          # (bq, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[0, 0]
    p = jnp.exp(s - lse)                          # softmax probs (bq, S)

    dp_tilde = jax.lax.dot_general(               # d(dropped probs)
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        keep = _dropout_keep(seed_ref, p.shape, rate)
        mr = jnp.where(keep, 1.0 / (1.0 - rate), 0.0)
        pd = p * mr                               # dropped probs
        dp = dp_tilde * mr
    else:
        pd = p
        dp = dp_tilde
    # sum_k pd*dp_tilde == rowsum(do*o), valid with or without dropout
    row = jnp.sum(do.astype(jnp.float32) * o_ref[0, 0].astype(jnp.float32),
                  axis=-1, keepdims=True)
    ds = p * (dp - row)                           # (bq, S) fp32
    ds_lp = ds.astype(q.dtype)

    dq_ref[0, 0] = (scale * jax.lax.dot_general(
        ds_lp, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )).astype(dq_ref.dtype)

    @pl.when(i == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += scale * jax.lax.dot_general(
        ds_lp, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[0, 0] += jax.lax.dot_general(
        pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(jnp.logical_and(h == 0, i == 0))
    def _():
        db_ref[0, 0] = jnp.zeros_like(db_ref[0, 0])

    db_ref[0, 0] += jnp.sum(ds, axis=0)


def _pad_block(S: int, block_q: int) -> tuple:
    bq = min(block_q, S)
    return bq, -(-S // bq) * bq


def _prep(q, k, v, bias, S_pad):
    """(B,S,H,D) -> padded (B,H,S_pad,D) + (B,1,S_pad) key bias."""
    B, S, _, _ = q.shape
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    key_bias = (
        bias[:, 0, 0, :].astype(jnp.float32) if bias is not None
        else jnp.zeros((B, S), jnp.float32)
    )
    if S_pad != S:
        pad = S_pad - S
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        key_bias = jnp.pad(key_bias, ((0, 0), (0, pad)),
                           constant_values=NEG_BIAS)
    return qt, kt, vt, key_bias[:, None, :]


NEG_BIAS = -1e9


def _train_call_fwd(q, k, v, bias, seed, rate, block_q, interpret):
    B, S, H, D = q.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    scale = 1.0 / (D ** 0.5)
    bq, S_pad = _pad_block(S, block_q)
    qt, kt, vt, key_bias = _prep(q, k, v, bias, S_pad)
    grid = (B, H, S_pad // bq)
    kern = functools.partial(_train_fwd_kernel, scale=scale, rate=rate)
    out, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (2,)
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            # trailing singleton: TPU block tiling requires the last two
            # block dims to be (8k, 128k) or full — (bq, 1) qualifies
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, S_pad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S_pad * S_pad * D,
            bytes_accessed=4 * B * H * S_pad * D * q.dtype.itemsize,
            transcendentals=B * H * S_pad * S_pad,
        ),
        interpret=interpret,
    )(seed, qt, kt, vt, key_bias)
    return out, lse, (qt, kt, vt, key_bias)


def _train_call_bwd(res, g, rate, block_q, interpret):
    qt, kt, vt, key_bias, out, lse, seed = res
    B, H, S_pad, D = qt.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    scale = 1.0 / (D ** 0.5)
    bq = min(block_q, S_pad)
    grid = (B, H, S_pad // bq)
    kern = functools.partial(_train_bwd_kernel, scale=scale, rate=rate)
    qspec = pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, S_pad, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv, db = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            qspec, kspec, kspec,                     # q, k, v
            pl.BlockSpec((1, 1, S_pad), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # bias
            qspec,                                   # o
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),   # lse
            qspec,                                   # do
        ],
        out_specs=[
            qspec,                                                   # dq
            pl.BlockSpec((1, 1, S_pad, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),                   # dk
            pl.BlockSpec((1, 1, S_pad, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),                   # dv
            pl.BlockSpec((1, 1, S_pad), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),                   # db
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S_pad, D), qt.dtype),
            jax.ShapeDtypeStruct((B, H, S_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, S_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, S_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * S_pad * S_pad * D,
            bytes_accessed=8 * B * H * S_pad * D * 4,
            transcendentals=B * H * S_pad * S_pad,
        ),
        interpret=interpret,
    )(seed, qt, kt, vt, key_bias, out, lse, g)
    return dq, dk, dv, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_train(q, k, v, bias, rate, block_q, interpret):
    """Differentiable flash attention; ``bias`` doubles as dropout carrier.

    ``bias`` is a pair ``(key_bias_or_None, seed_int32_pair)`` — the seed
    rides in the pytree so the custom VJP sees a single differentiable
    argument tuple (integer leaves get symbolic-zero cotangents).
    """
    key_bias, seed = bias
    out, _, _ = _train_call_fwd(q, k, v, key_bias, seed, rate, block_q,
                                interpret)
    S = q.shape[1]
    return jnp.transpose(out[:, :, :S, :], (0, 2, 1, 3))


def _flash_train_fwd(q, k, v, bias, rate, block_q, interpret):
    key_bias, seed = bias
    out, lse, (qt, kt, vt, kb) = _train_call_fwd(
        q, k, v, key_bias, seed, rate, block_q, interpret)
    S = q.shape[1]
    primal = jnp.transpose(out[:, :, :S, :], (0, 2, 1, 3))
    return primal, (qt, kt, vt, kb, out, lse, seed, key_bias)


def _flash_train_bwd(rate, block_q, interpret, res, g):
    qt, kt, vt, kb, out, lse, seed, orig_bias = res
    S = g.shape[1]
    B, H, S_pad, D = qt.shape
    gt = jnp.transpose(g, (0, 2, 1, 3))
    if S_pad != S:
        gt = jnp.pad(gt, ((0, 0), (0, 0), (0, S_pad - S), (0, 0)))
    dq, dk, dv, db = _train_call_bwd(
        (qt, kt, vt, kb, out, lse, seed), gt.astype(qt.dtype),
        rate, block_q, interpret)

    def back(x, dtype):
        return jnp.transpose(x[:, :, :S, :], (0, 2, 1, 3)).astype(dtype)

    dbias = (
        db[:, None, :, :S].astype(orig_bias.dtype)  # (B, 1, 1, S)
        if orig_bias is not None else None
    )
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (back(dq, qt.dtype), back(dk, kt.dtype), back(dv, vt.dtype),
            (dbias, dseed))


_flash_train.defvjp(_flash_train_fwd, _flash_train_bwd)


# ---------------------------------------------------------------------------
# inference kernel (bf16 MXU compute, no dropout, no VJP)
# ---------------------------------------------------------------------------

def _infer_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                  heads: int):
    """One (batch, q-block) program, ALL heads unrolled inside.

    Design point vs ``_train_fwd_kernel``: the head loop lives inside the
    program (grid is B x q-blocks, not B x H x q-blocks) — 12x fewer
    program launches, whose fixed cost dominated at seq 256.  (Both
    kernels now run MXU dots on the input dtype with fp32 accumulation;
    the train kernel additionally writes the logsumexp residual and draws
    in-kernel dropout.)  Softmax stays in fp32.
    """
    bias = bias_ref[0, 0]                          # (1, S) fp32
    for h in range(heads):
        q = q_ref[0, h]                            # (bq, D)  input dtype
        k = k_ref[0, h]                            # (S, D)
        v = v_ref[0, h]                            # (S, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias                           # (bq, S) fp32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        pn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        o_ref[0, h] = jax.lax.dot_general(
            pn, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def infer_kernel_fits(S: int, H: int, D: int, *, block_q: int = 512,
                      itemsize: int = 2) -> bool:
    """Whether the all-heads-per-program inference kernel fits VMEM.

    The kernel's per-program working set is the full (H, S, D) k/v blocks
    (double-buffered by the Mosaic pipeline), the (H, bq, D) q/out blocks,
    and the fp32 (bq, S) score/probability intermediates.  At the trunk
    shape (H=12, S=512) that is ~4 MB; at the ProtBERT backbone shape
    (H=16, S=3072) it is ~56 MB — past the 16 MB scoped-VMEM limit, where
    compilation FAILS (measured round 4: the S>=384 auto-selection broke
    the ProtSTonKGs forward until this gate).  Callers must fall back to
    :func:`flash_attention_train`'s per-head grid for larger shapes.

    Round-5 recalibration (exposed by the fp32 numerics pass of
    ``bench_bucketed_extract``): Mosaic multi-buffers the pipelined blocks
    up to FOUR deep at realistic grid sizes — fp32 H=12 S=512 bq=512 fails
    with a scoped allocation of exactly 24.00M = 4 x the k+v+q+out block
    bytes against the 16.00M scoped limit (the deep buffering kicks in at
    grid dim0 >= 32; bf16 at the same shape, 12M of blocks, compiles at
    any batch).  The model now charges 4x ONE buffer set plus the fp32
    score/probability body temporaries against the measured 16 MB budget.
    Measured calibration points:

    * bf16 H=12 S=512 bq=512 — model 14.6M — PASS (production trunk path)
    * bf16 H=12 S=384 bq=384 — model 10.9M — PASS (bucketed trunk)
    * fp32 H=12 S=512 bq=128 — model 15.75M — PASS
    * fp32 H=12 S=512 bq=256 — model 18.75M — FAIL
    * fp32 H=12 S=384 bq=384 — model 19.7M — FAIL
    * bf16 H=16 S=3072 — model ~75M — FAIL (the round-4 ProtBERT case)

    The per-head train-kernel fallback is measured to compile at fp32
    B=64 S=512, so rejecting here is always safe."""
    bq = min(block_q, S)
    kv = 2 * H * S * D * itemsize              # k+v, one buffer set
    qo = 2 * H * bq * D * itemsize             # q+out, one buffer set
    scores = 2 * bq * S * 4 + bq * S * itemsize  # s, p fp32 + input cast
    return 4 * (kv + qo) + scores <= 16 * 1024 * 1024


def flash_attention_infer(
    q: Array,  # (B, S, H, D)
    k: Array,
    v: Array,
    bias: Optional[Array] = None,  # (B, 1, 1, S) additive key bias
    *,
    block_q: int = 512,
    interpret: Optional[bool] = None,
) -> Array:
    """Inference-optimized flash attention: bf16 MXU matmuls, fp32 softmax.

    Differentiable via custom VJP, but the backward path re-runs the
    fp32 TRAIN forward kernel to obtain logsumexp residuals — use
    :func:`flash_attention_train` for real training (and for dropout).
    Drives the embedding-extraction path (the reference's per-row loop,
    ``stonkgs_for_embeddings.py:176-184``)."""
    return _flash_infer(q, k, v, bias, block_q, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_infer(q, k, v, bias, block_q, interpret):
    return _infer_call(q, k, v, bias, block_q, interpret)


def _flash_infer_fwd(q, k, v, bias, block_q, interpret):
    # under differentiation: run the TRAIN forward (fp32 compute, saves
    # logsumexp) so the existing train backward kernel can be reused
    seed = jnp.zeros((2,), jnp.int32)
    bq = min(block_q, 256)
    out, lse, (qt, kt, vt, kb) = _train_call_fwd(
        q, k, v, bias, seed, 0.0, bq, interpret)
    S = q.shape[1]
    primal = jnp.transpose(out[:, :, :S, :], (0, 2, 1, 3))
    return primal, (qt, kt, vt, kb, out, lse, seed, bias)


def _flash_infer_bwd(block_q, interpret, res, g):
    dq, dk, dv, (dbias, _) = _flash_train_bwd(
        0.0, min(block_q, 256), interpret, res, g)
    return dq, dk, dv, dbias


_flash_infer.defvjp(_flash_infer_fwd, _flash_infer_bwd)


def _infer_call(
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array],
    block_q: int,
    interpret: Optional[bool],
) -> Array:
    B, S, H, D = q.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    scale = 1.0 / (D ** 0.5)
    bq, S_pad = _pad_block(S, block_q)
    qt, kt, vt, key_bias = _prep(q, k, v, bias, S_pad)
    grid = (B, S_pad // bq)
    out = pl.pallas_call(
        functools.partial(_infer_kernel, scale=scale, heads=H),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, bq, D), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S_pad, D), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S_pad, D), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, bq, D), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S_pad, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S_pad * S_pad * D,
            bytes_accessed=4 * B * H * S_pad * D * q.dtype.itemsize,
            transcendentals=B * H * S_pad * S_pad,
        ),
        interpret=interpret,
    )(qt, kt, vt, key_bias)
    return jnp.transpose(out[:, :, :S, :], (0, 2, 1, 3))


def flash_attention_train(
    q: Array,  # (B, S, H, D)
    k: Array,
    v: Array,
    bias: Optional[Array] = None,  # (B, 1, 1, S) additive key bias
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[Array] = None,
    block_q: int = 256,
    interpret: Optional[bool] = None,
) -> Array:
    """Differentiable flash attention with in-kernel attention dropout.

    The backward pass recomputes probabilities from (q, k, logsumexp) in a
    Pallas kernel — no (Sq, Sk) residuals are saved, so training fits
    without rematerializing the attention block.
    """
    if dropout_rate > 0.0 and dropout_rng is not None:
        data = jax.random.key_data(dropout_rng) \
            if jnp.issubdtype(dropout_rng.dtype, jax.dtypes.prng_key) \
            else dropout_rng
        seed = jax.lax.bitcast_convert_type(
            data.reshape(-1)[:2], jnp.int32)
        rate = float(dropout_rate)
    else:
        seed = jnp.zeros((2,), jnp.int32)
        rate = 0.0
    if q.shape[1] > 1024:
        block_q = min(block_q, 128)  # bound the (bq, S) fp32 tiles in VMEM
    return _flash_train(q, k, v, (bias, seed), rate, block_q, interpret)
