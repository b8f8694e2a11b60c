"""Checkpointing via orbax (TPU-idiomatic: async, multi-host safe).

Reference parity: orbax CheckpointManager with composite ("state",
"metadata") items, latest/best restore, and reset-optimizer restore
(train.py:209-341, convert.py:267-303). Conversion artifacts that the
reference pickles (sc_calibrated_params.pkl etc., convert.py:882-971) are
saved here as versioned orbax items instead.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from sparsernns_tpu.train.state import TrainState


class CheckpointManager:
    """Thin wrapper around ocp.CheckpointManager for TrainState+metadata."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 best_fn=None, save_interval_steps: int = 1):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=best_fn,
            best_mode="max" if best_fn else "max",
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=True,
        )
        self._mngr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState,
             metadata: Optional[Dict[str, Any]] = None,
             metrics: Optional[Dict[str, float]] = None):
        args = {"state": ocp.args.StandardSave(_savable(state))}
        if metadata is not None:
            args["metadata"] = ocp.args.JsonSave(metadata)
        self._mngr.save(step, args=ocp.args.Composite(**args),
                        metrics=metrics)

    def wait(self):
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mngr.best_step()

    def all_steps(self):
        return self._mngr.all_steps()

    def restore(self, state: TrainState, step: Optional[int] = None
                ) -> Tuple[TrainState, Optional[Dict[str, Any]]]:
        """Restore into the structure of ``state`` (the reference's
        abstract-pytree StandardRestore pattern, train.py:226-235)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return state, None
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, _savable(state))
        restored = self._mngr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                metadata=ocp.args.JsonRestore(),
            ))
        new_state = state.replace(**restored["state"])
        return new_state, restored.get("metadata")

    def restore_params_only(self, state: TrainState,
                            step: Optional[int] = None) -> TrainState:
        """--reset_optimizer: restore params+batch_stats into a FRESH
        optimizer state (reference train.py:276-341)."""
        restored, _ = self.restore(state, step)
        return state.replace(params=restored.params,
                             batch_stats=restored.batch_stats,
                             masks=restored.masks)

    def close(self):
        self._mngr.close()


def _savable(state: TrainState) -> Dict[str, Any]:
    out = {"params": state.params, "step": state.step,
           "opt_state": state.opt_state}
    if state.batch_stats is not None:
        out["batch_stats"] = state.batch_stats
    if state.masks is not None:
        out["masks"] = state.masks
    return out


class ArtifactStore:
    """Versioned storage for conversion artifacts (calibrated params,
    frozen scales, activations) — replaces the reference's pickle sidecars
    with orbax StandardCheckpointer items."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, tree: Any):
        path = self._path(name)
        self._ckptr.save(path, tree, force=True)
        self._ckptr.wait_until_finished()

    def load(self, name: str, like: Optional[Any] = None) -> Any:
        path = self._path(name)
        if like is not None:
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, like)
            return self._ckptr.restore(path, abstract)
        return self._ckptr.restore(path)

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))
