"""Fast host-side parameter initialization.

``init_stonkgs_params`` draws truncated normals with jax.random — correct
but slow for 300M params over a device tunnel.  For benchmarks and compile
checks, fill the same structure with numpy RNG on the host.
"""

from __future__ import annotations

import jax
import numpy as np


def fast_random_like(shape_tree, seed: int = 0, std: float = 0.02):
    """Numpy-filled params matching a jax.eval_shape tree."""
    rng = np.random.default_rng(seed)

    def fill(s):
        dt = np.dtype(s.dtype)
        if np.issubdtype(dt, np.floating):
            return (rng.standard_normal(s.shape, dtype=np.float32) * std).astype(dt)
        return np.zeros(s.shape, dt)

    return jax.tree.map(fill, shape_tree)


def fast_init(init_fn, *args, seed: int = 0, std: float = 0.02, **kwargs):
    """Evaluate ``init_fn``'s shapes abstractly and fill on the host."""
    shapes = jax.eval_shape(init_fn, *args, **kwargs)
    return fast_random_like(shapes, seed=seed, std=std)
