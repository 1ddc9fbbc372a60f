"""Async checkpoint saves + crash-during-save recovery.

Round-3 behavior: mid-run saves are non-blocking
(``CheckpointManager.save(blocking=False)``) — Orbax finalizes on a
background thread and a crash mid-save leaves only an
``*.orbax-checkpoint-tmp`` directory, which restore must ignore.
Reference equivalent: HF Trainer ``get_last_checkpoint`` skipping
incomplete checkpoint dirs
(``/root/reference/src/stonkgs/models/stonkgs_pretraining.py:195-212``).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from stonkgs_tpu.train.checkpoint import CheckpointManager
from stonkgs_tpu.train.optimizer import make_optimizer, split_frozen
from stonkgs_tpu.train.pretraining import TrainState, init_train_state


def _tiny_state(seed=0):
    params = {
        "trunk": {"w": jnp.asarray(
            np.random.default_rng(seed).normal(size=(8, 8)), jnp.float32)},
        "lm_backbone": {"w": jnp.zeros((4, 4), jnp.float32)},
    }
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=10)
    return params, init_train_state(params, tx)


def test_async_save_then_wait_is_durable(tmp_path):
    _, state = _tiny_state()
    mngr = CheckpointManager(str(tmp_path), save_total_limit=2)
    mngr.save(1, state, blocking=False)
    mngr.wait()
    assert mngr.latest_step() == 1
    restored = mngr.restore_latest(state)
    np.testing.assert_array_equal(
        np.asarray(restored.params["trunk"]["w"]),
        np.asarray(state.params["trunk"]["w"]))


def test_restore_ignores_interrupted_tmp_dir(tmp_path):
    """A crash mid-save leaves <step>.orbax-checkpoint-tmp; resume must
    come from the previous durable checkpoint."""
    _, state = _tiny_state()
    mngr = CheckpointManager(str(tmp_path), save_total_limit=3)
    mngr.save(2, state)  # durable
    # simulate a SIGKILL during the step-4 save: tmp dir, never renamed
    fake = os.path.join(str(tmp_path), "4.orbax-checkpoint-tmp")
    os.makedirs(fake)
    with open(os.path.join(fake, "partial"), "w") as f:
        f.write("interrupted")

    # a FRESH manager (new process after the kill) must see only step 2
    mngr2 = CheckpointManager(str(tmp_path), save_total_limit=3)
    assert mngr2.latest_step() == 2
    restored = mngr2.restore_latest(state)
    assert int(restored.step) == int(state.step)

    # and training past the crash point overwrites cleanly
    mngr2.save(4, state)
    assert mngr2.latest_step() == 4


def test_async_saves_do_not_corrupt_under_rotation(tmp_path):
    """Several queued async saves + rotation finalize to the newest set."""
    params, state = _tiny_state()
    tx = make_optimizer(params, learning_rate=1e-3, total_steps=10)
    mngr = CheckpointManager(str(tmp_path), save_total_limit=2)
    for step in (1, 2, 3):
        train_p, _ = split_frozen(state.params)
        state = TrainState(step=jnp.asarray(step), params=state.params,
                           opt_state=state.opt_state, rng=state.rng)
        mngr.save(step, state, blocking=False)
    mngr.wait()
    assert mngr.latest_step() == 3
    kept = sorted(d for d in os.listdir(str(tmp_path)) if d.isdigit())
    assert kept == ["2", "3"], kept
