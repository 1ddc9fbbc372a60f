"""Multi-host (multi-process) training support.

The v5e-16 target (BASELINE config 5) spans two hosts: each process sees 8
local chips; the mesh is global.  This module wraps the three pieces the
reference delegated to torch.distributed launchers (SURVEY.md §2.2/§5.8):

  * ``initialize()``      — ``jax.distributed.initialize`` from env vars,
  * ``host_local_batch``  — slice the per-process portion of a global batch,
  * ``global_batch``      — assemble a globally-sharded jax.Array from
    process-local data (``jax.make_array_from_process_local_data``).

Single-process environments degrade to no-ops, so the same training code
runs on one chip, a virtual CPU mesh, and a real multi-host slice.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import numpy as np

from stonkgs_tpu.parallel.mesh import batch_sharding

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (idempotent; no-op single-process).

    Arguments default to the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID environment variables (also auto-detected on Cloud TPU).
    """
    coordinator_address = coordinator_address or os.getenv("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if coordinator_address is None and num_processes in (None, 1):
        logger.info("single-process run; skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info("initialized process %d/%d",
                jax.process_index(), jax.process_count())


def _int_env(name):
    v = os.getenv(name)
    return int(v) if v else None


def host_local_slice(n: int) -> slice:
    """This process's contiguous shard of a length-n global batch."""
    p, k = jax.process_count(), jax.process_index()
    assert n % p == 0, f"global batch {n} not divisible by {p} processes"
    per = n // p
    return slice(k * per, (k + 1) * per)


def global_batch(features: Dict[str, np.ndarray], mesh) -> Dict[str, jax.Array]:
    """Per-process local arrays -> globally data-sharded jax.Arrays.

    ``features`` holds each process's OWN rows (global_batch_size /
    process_count each); the result behaves as the full global batch under
    pjit."""
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in features.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in features.items()
    }


def multihost_data_iterator(
    features: Dict[str, np.ndarray],
    global_batch_size: int,
    mesh,
    *,
    seed: int = 0,
):
    """Epoch iterator yielding globally-sharded batches.

    Every process computes the SAME permutation (seeded host-independent
    RNG) and materializes only its own slice — the per-host input pipeline
    that replaces torch DataLoader workers."""
    n = len(features["input_ids"])
    rng = np.random.default_rng(seed)
    local = host_local_slice(global_batch_size)
    while True:
        perm = rng.permutation(n)
        for i in range(0, n - global_batch_size + 1, global_batch_size):
            idx = perm[i: i + global_batch_size][local]
            yield global_batch(
                {k: v[idx] for k, v in features.items()}, mesh)
