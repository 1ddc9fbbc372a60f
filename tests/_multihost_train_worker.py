"""Worker for the 2-process TRAINING test (multi-process pretrain()).

Run as: python _multihost_train_worker.py <pid> <nproc> <port> <max_steps>
        <ckpt_dir>

Each process sees 2 local CPU devices (4 global); the full ``pretrain()``
loop runs over a 4-way data-parallel global mesh: sharded params, psum'd
gradients, a distributed Orbax checkpoint save, and (second invocation)
auto-resume from it.  ``build_case()`` is imported by the pytest side to
run the identical single-process job for the equivalence assertion — the
multi-process run must reproduce its loss trajectory and final params.

Reference equivalent being replaced: HF Trainer + accelerate/DeepSpeed
launchers (``/root/reference/src/stonkgs/models/stonkgs_pretraining.py:
146-212``).
"""

import sys

import numpy as np


def build_case():
    """Deterministic (cfg, params, features, run_cfg) shared by both the
    2-process workers and the single-process comparison run."""
    import jax

    from stonkgs_tpu.config import BertConfig, STonKGsConfig
    from stonkgs_tpu.models import stonkgs
    from stonkgs_tpu.train.pretraining import PretrainingConfig

    cfg = STonKGsConfig(
        bert=BertConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=32,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0),
        kg_vocab_size=111, text_len=16, entity_len=16)
    params = stonkgs.init_stonkgs_params(jax.random.PRNGKey(0), cfg)
    # host-side numpy: multi-process device_put requires process-local
    # (identical) host buffers, not committed single-device arrays
    params = jax.tree.map(np.asarray, params)

    rng = np.random.default_rng(1234)
    n = 16
    mlm = np.full((n, 16), -100, np.int64)
    elm = np.full((n, 16), -100, np.int64)
    mlm[:, 2:4] = rng.integers(0, 97, (n, 2))
    elm[:, 5:7] = rng.integers(0, 111, (n, 2))
    feats = {
        "input_ids": np.concatenate(
            [rng.integers(0, 97, (n, 16)), rng.integers(0, 111, (n, 16))], 1),
        "attention_mask": np.ones((n, 32), np.int64),
        "token_type_ids": np.concatenate(
            [np.zeros((n, 16), np.int64), np.ones((n, 16), np.int64)], 1),
        "masked_lm_labels": mlm,
        "ent_masked_lm_labels": elm,
        "next_sentence_labels": rng.integers(0, 2, (n,)),
    }
    run_cfg = PretrainingConfig(
        learning_rate=1e-3, max_steps=2, micro_batch_size=8,
        grad_accumulation_steps=1, save_steps=2, log_steps=1,
        compute_dtype="float32", seed=3,
    )
    return cfg, params, feats, run_cfg


def final_checksums(state) -> dict:
    """Scalar fingerprints of the trained state for cross-run comparison."""
    import jax

    p = state.params
    return {
        "step": int(state.step),
        "trunk_q": float(np.abs(np.asarray(
            p["trunk"]["encoder"]["attention"]["query"]["kernel"])).sum()),
        "ent_dec": float(np.abs(np.asarray(
            p["cls"]["predictions"]["entity_decoder"]["kernel"])).sum()),
        "rng": int(np.asarray(jax.device_get(state.rng)).sum()),
    }


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    pid, nproc, port, max_steps = (int(a) for a in sys.argv[1:5])
    ckpt_dir = sys.argv[5]

    from stonkgs_tpu.parallel import multihost
    from stonkgs_tpu.parallel.mesh import make_mesh
    from stonkgs_tpu.train.pretraining import pretrain

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid,
    )
    assert jax.process_count() == nproc
    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)

    # the LR schedule is pinned to the FULL horizon (4 steps); phase 1
    # stops early at step 2 (stop_at_step — the "kill"), so the resumed
    # trajectory is identical to an uninterrupted 4-step run
    cfg, params, feats, run_cfg = build_case()
    run_cfg = type(run_cfg)(**{
        **run_cfg.__dict__, "max_steps": 4,
        "stop_at_step": max_steps if max_steps < 4 else None,
    })

    losses = []
    state = pretrain(cfg, params, feats, run_cfg, mesh=mesh,
                     checkpoint_dir=ckpt_dir,
                     log_fn=lambda s, m: losses.append((s, m["loss"])))
    sums = final_checksums(state)
    print(f"TRAIN_OK pid={pid} losses={losses!r} sums={sums!r}")


if __name__ == "__main__":
    main()
