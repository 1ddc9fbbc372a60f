"""Parity of the Pallas block-sparse kernel vs the XLA reference lowering.

The XLA implementation (``ops/bigbird_sparse.py``) is itself parity-pinned
against HF BigBird (``test_bigbird_parity.py``); the Pallas kernel must be
numerically identical to it in fp32. Runs in interpreter mode on the CPU
test mesh.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from stonkgs_tpu.ops.bigbird_sparse import block_sparse_attention
from stonkgs_tpu.ops.bigbird_sparse_pallas import block_sparse_attention_pallas

B, H, D = 2, 3, 8
BS = 16


def _inputs(nb, r, seed=0, padded=True):
    rng = np.random.default_rng(seed)
    S = nb * BS
    q, k, v = (rng.normal(size=(B, H, S, D)).astype(np.float32) * 0.5
               for _ in range(3))
    mask = np.ones((B, S), np.float32)
    if padded:
        mask[0, -20:] = 0.0   # pad crossing the last block boundary
        mask[1, 37:45] = 0.0  # pad inside a middle block
    # a valid random plan: blocks outside {0, i-1, i, i+1, last}
    rand = np.zeros((H, nb - 2, r), np.int32)
    for h in range(H):
        for j in range(nb - 2):
            i = j + 1
            legal = ([b for b in range(1, nb - 1) if abs(b - i) > 1]
                     or list(range(1, nb - 1)))  # numerics don't need HF's
            rand[h, j] = rng.choice(legal, r, replace=len(legal) < r)
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(rand), jnp.asarray(mask))


@pytest.mark.parametrize("nb,r", [(8, 2), (6, 3), (5, 1)])
def test_pallas_matches_xla_fp32(nb, r):
    q, k, v, rand, mask = _inputs(nb, r)
    ref = block_sparse_attention(q, k, v, rand, mask, BS)
    got = block_sparse_attention_pallas(q, k, v, rand, mask, BS,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_pallas_matches_xla_eval_plan():
    """Eval mode: HF zeroes the random plan (all rand blocks -> block 0)."""
    nb, r = 7, 3
    q, k, v, _, mask = _inputs(nb, r, seed=1)
    rand = jnp.zeros((H, nb - 2, r), jnp.int32)
    ref = block_sparse_attention(q, k, v, rand, mask, BS)
    got = block_sparse_attention_pallas(q, k, v, rand, mask, BS,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_pallas_full_mask():
    nb, r = 8, 2
    q, k, v, rand, _ = _inputs(nb, r, seed=2, padded=False)
    mask = jnp.ones((B, nb * BS), jnp.float32)
    ref = block_sparse_attention(q, k, v, rand, mask, BS)
    got = block_sparse_attention_pallas(q, k, v, rand, mask, BS,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("nb,r,padded", [(8, 2, True), (6, 3, False)])
def test_pallas_gradients_match_xla(nb, r, padded):
    """q/k/v cotangents of the custom VJP == XLA autodiff through the
    reference block-sparse lowering (window overlap, global fan-in, and
    random-block scatter-accumulation all exercised)."""
    import jax

    q, k, v, rand, mask = _inputs(nb, r, seed=3, padded=padded)
    w = jnp.asarray(np.random.default_rng(9).normal(size=q.shape),
                    jnp.float32)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, rand, mask, BS) * w)

    ref = jax.grad(lambda *a: loss(block_sparse_attention, *a),
                   argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(
        lambda *a: loss(
            lambda q, k, v, rand, mask, bs: block_sparse_attention_pallas(
                q, k, v, rand, mask, bs, interpret=True), *a),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
            err_msg=f"grad mismatch for d{name}")


def test_pallas_gradients_bf16_finite():
    nb, r = 6, 2
    q, k, v, rand, mask = _inputs(nb, r, seed=4)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    import jax

    def loss(q, k, v):
        out = block_sparse_attention_pallas(q, k, v, rand, mask, BS,
                                            interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert g.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(g, np.float32)).all()


def test_pallas_matches_xla_block128():
    """128-token blocks (the from-scratch speed mode): same kernel, same
    oracle, wider tiles — parity must hold without any kernel change."""
    from stonkgs_tpu.ops.bigbird_sparse import build_rand_attn

    bs, S, r = 128, 1280, 2
    rng = np.random.default_rng(5)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.5, jnp.float32)
               for _ in range(3))
    mask = np.ones((B, S), np.float32)
    mask[0, -30:] = 0.0
    mask = jnp.asarray(mask)
    plan = jnp.asarray(build_rand_attn(S, bs, r, H, 1, S, training=True)[0])
    ref = block_sparse_attention(q, k, v, plan, mask, bs)
    got = block_sparse_attention_pallas(q, k, v, plan, mask, bs,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
