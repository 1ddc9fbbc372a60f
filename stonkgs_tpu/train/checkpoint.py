"""Orbax checkpointing with HF-Trainer-style rotation and auto-resume.

Reference behavior: save every ``save_steps`` keeping ``save_total_limit``
checkpoints, auto-resume via ``get_last_checkpoint``
(``/root/reference/src/stonkgs/models/stonkgs_pretraining.py:96,185-186,
195-212``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str, save_total_limit: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=save_total_limit,
                create=True,
            ),
        )

    def save(self, step: int, state, *, blocking: bool = True) -> None:
        """Save the TrainState at a step (rotates old checkpoints).

        ``blocking=False`` overlaps the serialization/disk write with
        subsequent training steps: Orbax's async checkpointer copies the
        device arrays during the ``save`` call itself (so donated buffers
        are never at risk) and finalizes on a background thread.  Call
        ``wait()`` (or a final blocking save) before relying on the files.
        """
        self._mngr.save(
            step, args=ocp.args.StandardSave(state.tree())
        )
        if blocking:
            self._mngr.wait_until_finished()

    def wait(self) -> None:
        """Block until any in-flight async save has finalized."""
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore_latest(self, template_state):
        """Restore the newest checkpoint into the template's structure.

        Returns None when the directory has no checkpoints (fresh run)."""
        step = self._mngr.latest_step()
        if step is None:
            return None
        try:
            restored = self._mngr.restore(
                step,
                args=ocp.args.StandardRestore(template_state.tree()),
            )
        except ValueError as e:
            if "structure" in str(e).lower() or "tree" in str(e).lower():
                raise ValueError(
                    f"checkpoint at step {step} does not match the current "
                    "train-state structure. Most likely it predates the "
                    "structural-freezing optimizer format (round 3: "
                    "opt_state covers only the TRAINABLE subtree and the "
                    "chain layout changed from multi_transform to a plain "
                    "chain). Re-export the checkpoint or resume with the "
                    f"matching code version. Original error: {e}"
                ) from e
            raise
        import dataclasses

        return dataclasses.replace(
            template_state,
            step=restored["step"],
            params=restored["params"],
            opt_state=jax.tree.unflatten(
                jax.tree.structure(template_state.opt_state),
                jax.tree.leaves(restored["opt_state"]),
            ),
            rng=restored["rng"],
        )
