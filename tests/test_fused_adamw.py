"""FusedClippedAdamW.update_and_apply must be bit-for-bit-close to the
optax chain (clip_by_global_norm + adamw + apply_updates)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from stonkgs_tpu.train.optimizer import make_optimizer


def _tree(seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(16, 8)) * scale,
                                        jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(8,)) * scale,
                                      jnp.float32)},
        "ln": {"scale": jnp.asarray(rng.normal(size=(8,)) * scale,
                                    jnp.float32)},
    }


@pytest.mark.parametrize("grad_scale,weight_decay,max_norm", [
    (1e-3, 0.0, 1.0),     # clip inactive
    (10.0, 0.0, 1.0),     # clip active
    (1e-3, 0.01, 1.0),    # weight decay on 2-D leaves only
    (10.0, 0.05, 0.5),    # both
    (1.0, 0.0, None),     # no clipping configured
])
def test_fused_matches_optax_chain(grad_scale, weight_decay, max_norm):
    tx = make_optimizer(None, learning_rate=1e-2, total_steps=7,
                        warmup_steps=2, weight_decay=weight_decay,
                        max_grad_norm=max_norm)
    params_a = _tree(0)
    params_b = jax.tree.map(jnp.copy, params_a)
    state_a = tx.init(params_a)
    state_b = tx.init(params_b)

    for step in range(5):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                np.random.default_rng(step).normal(size=p.shape)
                * grad_scale, jnp.float32),
            params_a)
        # reference: the optax two-pass path
        updates, state_a = tx.update(grads, state_a, params_a)
        params_a = optax.apply_updates(params_a, updates)
        # fused single-pass path
        params_b, state_b = tx.update_and_apply(grads, state_b, params_b)

        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(params_a),
                jax.tree_util.tree_leaves_with_path(params_b)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-7,
                err_msg=f"step {step} leaf {ka}")
        # moment states also agree
        for a, b in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-6, atol=1e-7)


def test_fused_inside_jit_with_donation():
    """The fused path runs under jit with donated state (the train-step
    configuration) and matches the eager result."""
    tx = make_optimizer(None, learning_rate=1e-2, total_steps=5)
    params = _tree(1)
    state = tx.init(params)
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)

    eager_p, eager_s = tx.update_and_apply(grads, state, params)

    jitted = jax.jit(tx.update_and_apply, donate_argnums=(1, 2))
    jit_p, jit_s = jitted(grads, tx.init(_tree(1)), _tree(1))
    for a, b in zip(jax.tree.leaves(eager_p), jax.tree.leaves(jit_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6)
