"""BASELINE config 3 (+ the single-host half of config 5): pre-training
examples/sec.

Full-scale STonKGs MLM+ELM+NSP train step (frozen backbones, gathered
masked-position decode, AdamW, bf16 compute / fp32 master+optimizer).

``--mesh N`` additionally runs the sharded step on an N-device virtual CPU
mesh (reduced model scale — CPU is for sharding validation, not speed;
the real multi-chip number comes from v5e hardware).

Reference equivalent: HF Trainer fp16 per-device batch 8
(``/root/reference/src/stonkgs/models/stonkgs_pretraining.py:171-193``);
no published throughput (BASELINE.md).

Prints ONE JSON line per mode: examples/sec/chip.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from _util import (  # noqa: E402
    emit, full_scale_config, init_params, synthetic_batch, timed_train_steps,
)

from stonkgs_tpu.train.optimizer import make_optimizer  # noqa: E402
from stonkgs_tpu.train.pretraining import (  # noqa: E402
    init_train_state, make_train_step,
)


def single_chip(batch_size: int, steps: int, kg_vocab: int, remat,
                attention_impl: str = "xla", accum: int = 1,
                variant: str = "stonkgs"):
    """``remat``: False | "full" | "attention" (selective)."""
    if variant == "transe":
        from stonkgs_tpu.config import STonKGsConfig

        # 256 text + [h, r, t, SEP] layout (transestonkgs_model.py:92-93)
        cfg = STonKGsConfig.transe(kg_vocab)
    else:
        cfg = full_scale_config(kg_vocab)
    params = init_params(cfg)
    tx = make_optimizer(params, learning_rate=1e-4, total_steps=1000)
    state = init_train_state(params, tx)
    step_fn = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16,
                              remat=remat, attention_impl=attention_impl,
                              grad_accumulation_steps=accum)
    batch = synthetic_batch(cfg, batch_size * accum,
                            with_pretraining_labels=True)
    _, dt = timed_train_steps(step_fn, state, batch, steps=steps)
    emit(
        f"pre-training throughput ({variant} MLM+ELM+NSP, bf16, batch "
        f"{batch_size}x{accum}, remat={remat}, attention={attention_impl}, "
        f"kg_vocab {kg_vocab})",
        batch_size * accum / dt, "examples/sec/chip",
        step_ms=round(dt * 1e3, 1),
    )


def virtual_mesh(n_devices: int, steps: int):
    """Sharded {data, model} step on a virtual CPU mesh (tiny scale)."""
    from stonkgs_tpu.config import BertConfig, STonKGsConfig
    from stonkgs_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from stonkgs_tpu.parallel.mesh import replicate_unsharded

    if len(jax.devices()) < n_devices:
        raise SystemExit(
            f"need {n_devices} devices; run under JAX_PLATFORMS=cpu with "
            f"jax.config jax_num_cpu_devices={n_devices} (see tests/conftest)")
    n_model = 2 if n_devices % 2 == 0 else 1
    mesh = make_mesh(n_data=n_devices // n_model, n_model=n_model)
    cfg = STonKGsConfig(
        bert=BertConfig(vocab_size=2048, hidden_size=128, num_hidden_layers=4,
                        num_attention_heads=4, intermediate_size=512,
                        max_position_embeddings=128),
        kg_vocab_size=5000, text_len=64, entity_len=64,
    )
    params = shard_params(init_params(cfg, dtype=jnp.float32), mesh)
    tx = make_optimizer(params, learning_rate=1e-4, total_steps=1000)
    state = init_train_state(params, tx)
    import dataclasses

    state = dataclasses.replace(
        state,
        step=replicate_unsharded(state.step, mesh),
        rng=replicate_unsharded(state.rng, mesh),
        opt_state=replicate_unsharded(state.opt_state, mesh),
    )
    step_fn = make_train_step(cfg, tx, compute_dtype=jnp.float32, mesh=mesh)
    B = 8 * (n_devices // n_model)
    batch = shard_batch(
        synthetic_batch(cfg, B, with_pretraining_labels=True), mesh)
    _, dt = timed_train_steps(step_fn, state, batch, steps=steps)
    emit(
        f"pre-training throughput (virtual {mesh.shape} CPU mesh, tiny "
        f"model, batch {B})",
        B / dt, "examples/sec/mesh",
        step_ms=round(dt * 1e3, 1),
        note="sharding validation on CPU, not a hardware speed number",
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--kg-vocab", type=int, default=100_000)
    ap.add_argument("--remat", default="full",
                    choices=["none", "full", "attention", "unroll"],
                    help="rematerialization mode for the trunk")
    ap.add_argument("--attention", default="xla", choices=["xla", "flash"],
                    help="attention impl (flash = Pallas custom-VJP kernel)")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation micro-steps per step")
    ap.add_argument("--mesh", type=int, default=0,
                    help="also run on an N-device virtual mesh")
    ap.add_argument("--variant", default="stonkgs",
                    choices=["stonkgs", "transe"])
    a = ap.parse_args()
    if a.mesh:
        virtual_mesh(a.mesh, a.steps)
    else:
        single_chip(a.batch_size, a.steps, a.kg_vocab,
                    False if a.remat == "none" else a.remat, a.attention,
                    a.accum, a.variant)
