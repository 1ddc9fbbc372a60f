"""Custom LayerNorm VJP == autodiff of the plain formula."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stonkgs_tpu.models.bert import layer_norm

EPS = 1e-12


def _plain_layer_norm(x, p, eps):
    f = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(f)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(f) + p["bias"].astype(f)).astype(x.dtype)


@pytest.mark.parametrize("shape", [(4, 16), (2, 8, 32)])
def test_layer_norm_value_and_grads(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 2.0)
    p = {"scale": jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32)),
         "bias": jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))}
    g = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    y1 = layer_norm(x, p, EPS)
    y0 = _plain_layer_norm(x, p, EPS)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-6)

    def loss_custom(x, p):
        return jnp.sum(layer_norm(x, p, EPS) * g)

    def loss_plain(x, p):
        return jnp.sum(_plain_layer_norm(x, p, EPS) * g)

    (dx1, dp1) = jax.grad(loss_custom, argnums=(0, 1))(x, p)
    (dx0, dp0) = jax.grad(loss_plain, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0),
                               atol=1e-5, rtol=1e-5)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(dp1[k]), np.asarray(dp0[k]),
                                   atol=1e-5, rtol=1e-5)


def test_layer_norm_bf16_dtypes():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 16)), jnp.bfloat16)
    p = {"scale": jnp.ones((16,), jnp.float32),
         "bias": jnp.zeros((16,), jnp.float32)}
    y, vjp = jax.vjp(lambda x, p: layer_norm(x, p, EPS), x, p)
    assert y.dtype == jnp.bfloat16
    dx, dp = vjp(jnp.ones_like(y))
    assert dx.dtype == jnp.bfloat16
    assert dp["scale"].dtype == jnp.float32
    assert np.isfinite(np.asarray(dx, np.float32)).all()
