"""Orbax checkpointing with step granularity.

Upgrades the reference's single overwritten checkpoint.tar per epoch
(train.py:226-234): retained step-tagged checkpoints, auto-resume from the
latest, and best-loss retention (the reference computes min_loss but never
uses it — train.py:214): pass `metrics={"loss": ...}` to save() and the
lowest-loss checkpoint is mirrored under <dir>/best (max_to_keep=1),
independent of the latest-k rotation that auto-resume relies on.
"""

from __future__ import annotations

import json
import os

import jax
import orbax.checkpoint as ocp

from graspbalance_tpu.train.train_step import TrainState


def _payload(state: TrainState) -> dict:
    return {
        "step": int(state.step),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_mgr = None  # lazily created on first save-with-metrics
        self._best_path = os.path.join(self._dir, "best.json")

    def _best(self):
        if self._best_mgr is None:
            self._best_mgr = ocp.CheckpointManager(
                os.path.join(self._dir, "best"),
                options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
            )
        return self._best_mgr

    def save_config(self, cfg):
        """Write the Config next to the checkpoints so inference drivers can
        rebuild the exact model (the reference never persists its argparse
        flags; a mismatched restore fails deep inside apply)."""
        from graspbalance_tpu.train.config import config_to_dict

        with open(os.path.join(self._dir, "config.json"), "w") as f:
            json.dump(config_to_dict(cfg), f, indent=1)

    def best_loss(self) -> float | None:
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                return json.load(f)["loss"]
        return None

    def save(
        self,
        step: int,
        state: TrainState,
        extra: dict | None = None,
        metrics: dict | None = None,
    ):
        payload = _payload(state)
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        if extra:
            # JSON sidecar: keeps the orbax tree structure independent of
            # variable bookkeeping metadata.
            with open(os.path.join(self._dir, f"extra_{step}.json"), "w") as f:
                json.dump(extra, f)
        loss = (metrics or {}).get("loss")
        if loss is not None:
            prev = self.best_loss()
            if prev is None or float(loss) < prev:
                best = self._best()
                best.save(step, args=ocp.args.StandardSave(payload))
                best.wait_until_finished()
                with open(self._best_path, "w") as f:
                    json.dump({"step": int(step), "loss": float(loss)}, f)

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
            with open(sidecar) as f:
                extra = json.load(f)
        return new_state, extra

    def close(self):
        self._mgr.close()
        if self._best_mgr is not None:
            self._best_mgr.close()


def load_config(directory: str):
    """Config saved by CheckpointManager.save_config, or None if absent
    (pre-round-3 checkpoints)."""
    from graspbalance_tpu.train.config import config_from_dict

    path = os.path.join(os.path.abspath(directory), "config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return config_from_dict(json.load(f))


def load_inference_variables(
    directory: str, step: int | None = None, best: bool = False
) -> tuple[dict, int]:
    """Restore {'params', 'batch_stats'} for inference without needing an
    optimizer template: restores the raw saved pytree (opt_state included,
    then dropped) so the template never mismatches the stored structure.

    Returns (variables, step). With best=True reads the best-loss mirror.
    """
    directory = os.path.abspath(directory)
    if best:
        directory = os.path.join(directory, "best")
        if not os.path.isdir(directory):
            raise FileNotFoundError(
                f"no best-loss mirror at {directory} (train long enough for "
                "one epoch-end save with metrics, or drop --best)"
            )
    with ocp.CheckpointManager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
        restored = mgr.restore(step, args=ocp.args.StandardRestore())
    return (
        {"params": restored["params"], "batch_stats": restored["batch_stats"]},
        int(restored["step"]),
    )
