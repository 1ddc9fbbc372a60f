"""Shared fixed-size batched inference helper.

One implementation of the "chunk, pad the final batch by repeating the last
row (so only one compiled shape exists), run the jitted fn, slice back"
pattern used by the engine, the fine-tuning predictor, and the baselines.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax.numpy as jnp
import numpy as np


def iter_padded_batches(
    features: Dict[str, np.ndarray],
    keys: Sequence[str],
    batch_size: int,
):
    """Yield (chunk dict of jnp arrays, n_valid) with a padded final batch."""
    keys = [k for k in keys if k in features]
    n = len(features[keys[0]])
    for i in range(0, n, batch_size):
        chunk = {k: features[k][i: i + batch_size] for k in keys}
        valid = len(chunk[keys[0]])
        if valid < batch_size:
            chunk = {
                k: np.concatenate(
                    [v, np.repeat(v[-1:], batch_size - valid, axis=0)], axis=0)
                for k, v in chunk.items()
            }
        yield {k: jnp.asarray(v) for k, v in chunk.items()}, valid


def batched_apply(
    fn: Callable[[Dict], "jnp.ndarray"],
    features: Dict[str, np.ndarray],
    keys: Sequence[str],
    batch_size: int,
) -> np.ndarray:
    """Concatenate fn(batch)[:n_valid] over all padded batches (fp32)."""
    outs = []
    for chunk, valid in iter_padded_batches(features, keys, batch_size):
        outs.append(np.asarray(fn(chunk)[:valid], np.float32))
    if not outs:
        # empty input: run one zero-filled batch to learn the output's
        # trailing shape (so (0, num_labels) arrays reduce cleanly
        # downstream), then keep 0 rows of it
        present = [k for k in keys if k in features]
        chunk = {
            k: jnp.zeros((batch_size,) + np.shape(features[k])[1:],
                         np.asarray(features[k]).dtype)
            for k in present
        }
        return np.asarray(fn(chunk)[:0], np.float32)
    return np.concatenate(outs, axis=0)
