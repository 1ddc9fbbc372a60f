"""Fused int8 Pallas dense kernel == XLA dense_int8 (interpreter mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stonkgs_tpu.ops.quantization import dense_int8, quantize_kernel
from stonkgs_tpu.ops.quantization_pallas import dense_int8_fused, supported


@pytest.mark.parametrize("M,K,N,bias", [
    (64, 128, 256, True),      # M below the tile size -> padding path
    (300, 256, 128, True),     # M not a tile multiple
    (512, 128, 384, False),    # no bias
])
def test_fused_matches_xla(M, K, N, bias):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(K, N)).astype(np.float32)
    q = quantize_kernel(w)
    if bias:
        q["bias"] = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, M // 2, K)).astype(np.float32))

    ref = dense_int8(x, q)
    got = dense_int8_fused(x, q["kernel_q"], q["scale"], q.get("bias"),
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_supported_gate():
    assert supported(jnp.zeros((768, 3072), jnp.int8))
    assert not supported(jnp.zeros((768, 100), jnp.int8))       # N % 128
    assert not supported(jnp.zeros((768, 28996), jnp.int8))     # decoder
    assert not supported(jnp.zeros((2, 768, 768), jnp.int8))    # stacked
