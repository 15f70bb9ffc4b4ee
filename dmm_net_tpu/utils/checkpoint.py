"""Checkpoint / resume via orbax (SURVEY.md §6 "Checkpoint / resume" row).

Reference: `torch.save({epoch, state_dict, optimizer})` + resume-by-epoch
flag. Rebuild: orbax `CheckpointManager` over the TrainState pytree with
  * async save (doesn't stall the step loop),
  * keep-last-k retention,
  * `--resume` auto-discovery of the latest step,
  * the data-pipeline position saved alongside (exact resume).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, keep: int = 3, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=keep, enable_async_checkpointing=async_save)
        self.manager = ocp.CheckpointManager(self.directory, options=opts)

    def save(self, state: Any, step: Optional[int] = None,
             extra: Optional[dict] = None) -> None:
        step = int(state.step) if step is None else step
        # tx/apply_fn are static (not saveable); strip to the array pytree
        payload = {"step": state.step, "params": state.params,
                   "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state}
        items = {"state": ocp.args.StandardSave(payload)}
        if extra is not None:
            items["extra"] = ocp.args.JsonSave(extra)
        self.manager.save(step, args=ocp.args.Composite(**items))

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `state` (created fresh)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return state
        payload = {"step": state.step, "params": state.params,
                   "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state}
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, payload)
        restored = self.manager.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore(target)))
        r = restored["state"]
        return state.replace(step=r["step"], params=r["params"],
                             batch_stats=r["batch_stats"],
                             opt_state=r["opt_state"])

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()
