"""BigBird block-sparse attention (ITC) in JAX.

Semantics match HF ``BigBirdBlockSparseAttention`` exactly (the ProtSTonKGs
trunk, reference ``/root/reference/src/stonkgs/models/protstonkgs_model.py:
137``): per query block — 2 global blocks (first/last), a 3-block sliding
window, and ``num_random_blocks`` random key blocks; the first/last query
blocks attend the full sequence; mask penalty -10000.

The random block plan is a **host-side static constant**: HF reseeds
``np.random.seed(layer_seed)`` on every forward (layer_seed = layer index),
so the plan never changes across steps, and in eval mode it is all zeros
(no randomness at inference).  We precompute it once per (config, mode)
with a faithful replication of HF's RNG call sequence and close over it as
a compile-time constant — TPU-friendly: the whole sparse attention lowers
to dense block gathers + batched matmuls on the MXU.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

ATTN_PENALTY = -10000.0


# ---------------------------------------------------------------------------
# host-side random-attention plan (replicates HF's np.random stream)
# ---------------------------------------------------------------------------

def _rand_mask_fixed_plan(
    max_seqlen: int, block_size: int, n_rand: int, last_idx: int
) -> np.ndarray:
    """HF ``_bigbird_block_rand_mask`` (training path), one head.

    Consumes the global np.random stream in the same order as HF."""
    nb = max_seqlen // block_size
    out = np.zeros((nb - 2, n_rand), np.int32)
    middle = np.arange(1, nb - 1, dtype=np.int32)
    last = nb - 1
    if last_idx > (2 * block_size):
        last = (last_idx // block_size) - 1
    for i in range(1, nb - 1):
        start, end = i - 2, i
        if i == 1:
            out[i - 1] = np.random.permutation(middle[2:last])[:n_rand]
        elif i == 2:
            out[i - 1] = np.random.permutation(middle[3:last])[:n_rand]
        elif i in (nb - 3, nb - 2):
            out[i - 1] = np.random.permutation(middle[:last])[:n_rand]
        else:
            if start > last:
                out[i - 1] = np.random.permutation(middle[:last])[:n_rand]
            elif (end + 1) == last:
                out[i - 1] = np.random.permutation(middle[:start])[:n_rand]
            else:
                out[i - 1] = np.random.permutation(
                    np.concatenate((middle[:start], middle[end + 1: last]))
                )[:n_rand]
    return out


def _single_row_rand(
    block_id: int, to_start: int, to_end: int, n_rand: int
) -> np.ndarray:
    """HF ``_get_single_block_row_attention`` with default window/global=1."""
    perm = np.random.permutation(np.arange(to_start, to_end, dtype=np.int32))
    illegal = set(range(block_id - 1, block_id + 2))
    illegal.add(0)
    illegal.add(to_end - 1)
    if block_id == 1:
        illegal.add(to_end - 2)
    if block_id == to_end - 2:
        illegal.add(1)
    picked = []
    for v in perm:
        if int(v) not in illegal:
            picked.append(int(v))
        if len(picked) == n_rand:
            break
    return np.asarray(picked, np.int32)


def _rand_mask_with_plan(
    seq_len: int, block_size: int, n_rand: int, num_heads: int
) -> list:
    """HF ``_bigbird_block_rand_mask_with_head`` for the common single- or
    two-phase plan (``_get_rand_attn_plan``)."""
    nb = seq_len // block_size
    # plan
    if (2 * n_rand + 5) < nb:
        plan_len = [(2 * n_rand + 5) * block_size, seq_len]
        plan_cnt = [n_rand, 0]
    elif (n_rand + 5) < nb:
        plan_len = [(n_rand + 5) * block_size, seq_len]
        plan_cnt = [n_rand // 2, n_rand - n_rand // 2]
    else:
        plan_len = [seq_len]
        plan_cnt = [n_rand]
    plan_blocks = np.array(plan_len) // block_size
    max_plan_idx = plan_len.index(seq_len)

    rand_attn = [
        np.zeros((nb, int(np.sum(plan_cnt[: max_plan_idx + 1]))), np.int32)
        for _ in range(num_heads)
    ]
    for plan_idx in range(max_plan_idx + 1):
        rnd_r_cnt = 0
        if plan_idx > 0:
            if plan_cnt[plan_idx] > 0:
                rnd_r_cnt = int(np.sum(plan_cnt[:plan_idx]))
                curr = int(np.sum(plan_cnt[: plan_idx + 1]))
                for row in range(1, plan_blocks[plan_idx - 1]):
                    for h in range(num_heads):
                        rand_attn[h][row, rnd_r_cnt:curr] = _single_row_rand(
                            row, plan_blocks[plan_idx - 1],
                            plan_blocks[plan_idx], plan_cnt[plan_idx],
                        )
            for pl_id in range(plan_idx):
                if plan_cnt[pl_id] == 0:
                    continue
                for row in range(plan_blocks[plan_idx - 1], plan_blocks[plan_idx]):
                    r0, start = 0, 0
                    if pl_id > 0:
                        r0 = int(np.sum(plan_cnt[:pl_id]))
                        start = plan_blocks[pl_id - 1]
                    curr = int(np.sum(plan_cnt[: pl_id + 1]))
                    for h in range(num_heads):
                        rand_attn[h][row, r0:curr] = _single_row_rand(
                            row, start, plan_blocks[pl_id], plan_cnt[pl_id]
                        )
        if plan_cnt[plan_idx] == 0:
            continue
        curr = int(np.sum(plan_cnt[: plan_idx + 1]))
        from_start, to_start = 1, 0
        if plan_idx > 0:
            rnd_r_cnt = int(np.sum(plan_cnt[:plan_idx]))
            from_start = plan_blocks[plan_idx - 1]
            to_start = plan_blocks[plan_idx - 1]
        for row in range(from_start, plan_blocks[plan_idx]):
            for h in range(num_heads):
                rand_attn[h][row, rnd_r_cnt:curr] = _single_row_rand(
                    row, to_start, plan_blocks[plan_idx], plan_cnt[plan_idx]
                )
    return [ra[1: nb - 1, :] for ra in rand_attn]


def build_rand_attn(
    seq_len: int,
    block_size: int,
    num_random_blocks: int,
    num_heads: int,
    num_layers: int,
    max_seqlen: int,
    training: bool,
) -> np.ndarray:
    """(L, H, nb-2, r) static random-block plan.

    HF wiring: layer ``i`` seeds ``np.random.seed(i)`` each forward
    (BigBirdEncoder passes seed=layer_idx); eval mode returns zeros."""
    nb = seq_len // block_size
    r = num_random_blocks
    if not training:
        return np.zeros((num_layers, num_heads, nb - 2, r), np.int32)
    out = np.zeros((num_layers, num_heads, nb - 2, r), np.int32)
    for layer in range(num_layers):
        np.random.seed(layer)
        if seq_len in (1024, 3072, 4096):
            per_head = [
                _rand_mask_fixed_plan(max_seqlen, block_size, r, last_idx=1024)
                [: nb - 2]
                for _ in range(num_heads)
            ]
        else:
            per_head = _rand_mask_with_plan(seq_len, block_size, r, num_heads)
        out[layer] = np.stack(per_head, axis=0)
    return out


# ---------------------------------------------------------------------------
# jnp attention
# ---------------------------------------------------------------------------

def block_sparse_attention(
    q: jnp.ndarray,            # (B, H, S, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    rand_attn: jnp.ndarray,    # (H, nb-2, r) int32, static per layer
    attention_mask: jnp.ndarray,  # (B, S) float 0/1
    block_size: int,
    precision=None,
) -> jnp.ndarray:
    """Returns (B, H, S, D) context; exact HF block-sparse semantics."""
    B, H, S, D = q.shape
    bs = block_size
    nb = S // bs
    r = rand_attn.shape[-1]
    f = jnp.promote_types(q.dtype, jnp.float32)
    rsqrt_d = 1.0 / (D ** 0.5)

    bq = q.reshape(B, H, nb, bs, D)
    bk = k.reshape(B, H, nb, bs, D)
    bv = v.reshape(B, H, nb, bs, D)
    mask = attention_mask.astype(f)
    bmask = mask.reshape(B, nb, bs)

    def softmax(x):
        return jax.nn.softmax(x.astype(f), axis=-1).astype(q.dtype)

    def dot(a, b):  # (..., m, d) x (..., n, d) -> (..., m, n)
        return jnp.einsum("...md,...nd->...mn", a, b, precision=precision)

    def wsum(w, val):  # (..., m, n) x (..., n, d) -> (..., m, d)
        return jnp.einsum("...mn,...nd->...md", w.astype(val.dtype), val,
                          precision=precision)

    # random-block gathers: (B, H, nb-2, r*bs, D)
    head_ix = jnp.arange(H)[:, None, None]
    gk = bk[:, head_ix, rand_attn].reshape(B, H, nb - 2, r * bs, D)
    gv = bv[:, head_ix, rand_attn].reshape(B, H, nb - 2, r * bs, D)
    # (B, H, nb-2, r*bs) key-validity of gathered random blocks
    grand_mask = bmask[:, rand_attn].reshape(B, H, nb - 2, r * bs)

    to_mask = mask[:, None, None, :]                     # (B,1,1,S)

    # ---- part 1: first query block attends everything
    p1 = dot(bq[:, :, 0], k) * rsqrt_d + (1.0 - to_mask) * ATTN_PENALTY
    ctx_first = wsum(softmax(p1), v)                     # (B,H,bs,D)

    # ---- part 2: second query block: blocks {0,1,2,-1} + rand row 0
    k2 = jnp.concatenate(
        [bk[:, :, 0], bk[:, :, 1], bk[:, :, 2], bk[:, :, -1], gk[:, :, 0]],
        axis=2)
    v2 = jnp.concatenate(
        [bv[:, :, 0], bv[:, :, 1], bv[:, :, 2], bv[:, :, -1], gv[:, :, 0]],
        axis=2)
    m2 = jnp.concatenate(
        [mask[:, : 3 * bs], mask[:, -bs:]], axis=1
    )[:, None, None, :]                                  # (B,1,1,4bs)
    m2 = jnp.broadcast_to(m2, (B, H, 1, 4 * bs))
    m2 = jnp.concatenate([m2, grand_mask[:, :, 0][:, :, None, :]], axis=3)
    p2 = dot(bq[:, :, 1], k2) * rsqrt_d + (1.0 - m2) * ATTN_PENALTY
    ctx_second = wsum(softmax(p2), v2)                   # (B,H,bs,D)

    # ---- part 3: middle blocks: window {i-1,i,i+1} + global {0,-1} + rand
    win_k = jnp.concatenate([bk[:, :, 1:-3], bk[:, :, 2:-2], bk[:, :, 3:-1]],
                            axis=3)                      # (B,H,nb-4,3bs,D)
    win_v = jnp.concatenate([bv[:, :, 1:-3], bv[:, :, 2:-2], bv[:, :, 3:-1]],
                            axis=3)
    mq = bq[:, :, 2:-2]                                  # (B,H,nb-4,bs,D)

    band = dot(mq, win_k) * rsqrt_d                      # (B,H,nb-4,bs,3bs)
    randp = dot(mq, gk[:, :, 1:-1]) * rsqrt_d            # (B,H,nb-4,bs,r*bs)
    firstp = jnp.einsum("bhlqd,bhkd->bhlqk", mq, bk[:, :, 0],
                        precision=precision) * rsqrt_d
    lastp = jnp.einsum("bhlqd,bhkd->bhlqk", mq, bk[:, :, -1],
                       precision=precision) * rsqrt_d

    band_mask = jnp.concatenate(
        [bmask[:, 1:-3], bmask[:, 2:-2], bmask[:, 3:-1]], axis=2
    )[:, None, :, None, :]                               # (B,1,nb-4,1,3bs)
    band = band + (1.0 - band_mask) * ATTN_PENALTY
    firstp = firstp + (1.0 - mask[:, None, None, None, :bs]) * ATTN_PENALTY
    lastp = lastp + (1.0 - mask[:, None, None, None, -bs:]) * ATTN_PENALTY
    randp = randp + (1.0 - grand_mask[:, :, 1:-1][:, :, :, None, :]) * ATTN_PENALTY

    full = jnp.concatenate([firstp, band, randp, lastp], axis=-1)
    w = softmax(full)                                    # (B,H,nb-4,bs,(5+r)bs)
    ctx_mid = wsum(w[..., bs: 4 * bs], win_v)
    ctx_mid += wsum(w[..., 4 * bs: 4 * bs + r * bs], gv[:, :, 1:-1])
    ctx_mid += jnp.einsum("bhlqk,bhkd->bhlqd", w[..., :bs].astype(bv.dtype),
                          bv[:, :, 0], precision=precision)
    ctx_mid += jnp.einsum("bhlqk,bhkd->bhlqd", w[..., -bs:].astype(bv.dtype),
                          bv[:, :, -1], precision=precision)

    # ---- part 4: second-to-last query block: {0,-3,-2,-1} + rand row -1
    k4 = jnp.concatenate(
        [bk[:, :, 0], bk[:, :, -3], bk[:, :, -2], bk[:, :, -1], gk[:, :, -1]],
        axis=2)
    v4 = jnp.concatenate(
        [bv[:, :, 0], bv[:, :, -3], bv[:, :, -2], bv[:, :, -1], gv[:, :, -1]],
        axis=2)
    m4 = jnp.concatenate([mask[:, :bs], mask[:, -3 * bs:]], axis=1)[:, None, None, :]
    m4 = jnp.broadcast_to(m4, (B, H, 1, 4 * bs))
    m4 = jnp.concatenate([m4, grand_mask[:, :, -1][:, :, None, :]], axis=3)
    p4 = dot(bq[:, :, -2], k4) * rsqrt_d + (1.0 - m4) * ATTN_PENALTY
    ctx_second_last = wsum(softmax(p4), v4)

    # ---- part 5: last query block attends everything
    p5 = dot(bq[:, :, -1], k) * rsqrt_d + (1.0 - to_mask) * ATTN_PENALTY
    ctx_last = wsum(softmax(p5), v)

    ctx = jnp.concatenate(
        [ctx_first[:, :, None], ctx_second[:, :, None],
         ctx_mid, ctx_second_last[:, :, None], ctx_last[:, :, None]],
        axis=2,
    ).reshape(B, H, S, D)
    # zero out padded query rows (HF multiplies by from_mask)
    ctx = ctx * mask[:, None, :, None].astype(ctx.dtype)
    return ctx
