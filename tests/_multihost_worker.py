"""Worker process for the 2-process multihost smoke test.

Run as: python _multihost_worker.py <process_id> <num_processes> <port>

Forces the CPU platform with 2 local devices per process, initializes
jax.distributed against a local coordinator, and exercises
``parallel/multihost.py`` for real (process_count == 2):
``global_batch`` assembly via ``jax.make_array_from_process_local_data``,
a cross-process collective (global sum), and the epoch iterator.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from stonkgs_tpu.parallel import multihost
    from stonkgs_tpu.parallel.mesh import make_mesh

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()
    n_global = len(jax.devices())
    assert n_global == 2 * nproc, n_global

    mesh = make_mesh(n_data=n_global, n_model=1)

    # Global batch of 8 rows; each process owns its contiguous half.
    global_rows = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    local = multihost.host_local_slice(8)
    feats = {"input_ids": global_rows[local]}
    gb = multihost.global_batch(feats, mesh)
    arr = gb["input_ids"]
    assert arr.shape == (8, 4), arr.shape

    total = float(jax.jit(lambda x: x.sum())(arr))
    expect = float(global_rows.sum())
    assert total == expect, (total, expect)

    # Epoch iterator: same permutation on every process, local slices only.
    it = multihost.multihost_data_iterator(
        {"input_ids": global_rows}, global_batch_size=4, mesh=mesh, seed=0)
    b0 = next(it)["input_ids"]
    assert b0.shape == (4, 4)
    s0 = float(jax.jit(lambda x: x.sum())(b0))

    print(f"WORKER_OK pid={pid} sum={total} batch0={s0}")


if __name__ == "__main__":
    main()
