"""Microbenchmark: does an int8 Pallas GEMM engage the v5e 2x int8 MXU rate?

Round-1 finding (PERF.md): XLA lowers int8 ``dot_general`` WITHOUT the 2x
rate (quant path measured slower than bf16). This probes whether a Pallas
kernel with int8 inputs + int32 accumulation reaches >98 TFLOP/s (the bf16
peak) — the gate for building the int8 inference mode (VERDICT item 4b).

Prints one JSON line per variant with achieved TFLOP/s.
"""

import argparse
import functools
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import emit, timed_op  # noqa: E402


def _matmul_kernel(a_ref, b_ref, o_ref, acc, *, acc_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc[:]


def pallas_matmul(a, b, *, tm=512, tn=512, tk=1024, acc_dtype=jnp.int32):
    M, K = a.shape
    _, N = b.shape
    kern = functools.partial(_matmul_kernel, acc_dtype=acc_dtype)
    return pl.pallas_call(
        kern,
        grid=(M // tm, N // tn, K // tk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k)),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), acc_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + K * N) * a.dtype.itemsize + M * N * 4,
            transcendentals=0,
        ),
    )(a, b)


def main(size: int = 4096, steps: int = 20):
    if size % 1024:
        raise SystemExit("--size must be a multiple of 1024 (tile shapes "
                         "divide the problem exactly; no remainder handling)")
    M = K = N = size
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    abf = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    bbf = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    flops = 2.0 * M * N * K

    # correctness of the Pallas int8 kernel on a slice
    small = np.asarray(
        pallas_matmul(a8[:512, :1024], b8[:1024, :512], tm=512, tn=512,
                      tk=1024))
    ref = np.asarray(a8[:512, :1024], np.int32) @ np.asarray(
        b8[:1024, :512], np.int32)
    assert (small == ref).all(), "pallas int8 matmul mismatch"

    variants = [
        ("xla bf16", jax.jit(lambda x, y: jnp.dot(
            x, y, preferred_element_type=jnp.float32)), abf, bbf),
        ("xla int8", jax.jit(lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)), a8, b8),
        ("pallas int8", jax.jit(pallas_matmul), a8, b8),
        ("pallas bf16 (control)",
         jax.jit(functools.partial(pallas_matmul, acc_dtype=jnp.float32)),
         abf, bbf),
    ]
    for name, fn, x, y in variants:
        dt = timed_op(fn, (x, y), steps=steps)
        emit(f"GEMM {size}^3 [{name}]", flops / dt / 1e12, "TFLOP/s",
             ms=round(dt * 1e3, 2))


def sweep(size: int = 4096, steps: int = 20):
    """Tile-shape sweep: how close can Pallas int8 get to the 2x MXU rate?"""
    if size % 2048:
        raise SystemExit("--size must be a multiple of 2048 for the sweep")
    M = K = N = size
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    abf = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    bbf = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    flops = 2.0 * M * N * K
    tiles = [(256, 256, 512), (256, 512, 1024), (512, 512, 512),
             (512, 512, 2048), (512, 1024, 2048), (1024, 256, 2048),
             (512, 2048, 1024), (1024, 1024, 1024), (2048, 512, 2048)]
    for tm, tn, tk in tiles:
        if tm > M or tn > N or tk > K:
            continue
        for name, x, y, acc in [("int8", a8, b8, jnp.int32),
                                ("bf16", abf, bbf, jnp.float32)]:
            fn = jax.jit(functools.partial(
                pallas_matmul, tm=tm, tn=tn, tk=tk, acc_dtype=acc))
            try:
                dt = timed_op(fn, (x, y), steps=steps)
            except Exception as e:  # noqa: BLE001 — report and continue
                emit(f"GEMM {size}^3 pallas {name} tiles=({tm},{tn},{tk})",
                     0.0, "TFLOP/s", error=type(e).__name__)
                continue
            emit(f"GEMM {size}^3 pallas {name} tiles=({tm},{tn},{tk})",
                 flops / dt / 1e12, "TFLOP/s", ms=round(dt * 1e3, 2))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--sweep", action="store_true")
    a = ap.parse_args()
    if a.sweep:
        sweep(a.size, a.steps)
    else:
        main(a.size, a.steps)
