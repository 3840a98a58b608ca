"""Training checkpoint/resume via orbax — capability the reference lacks.

The reference only publishes finished models (registry + local bundle,
reference training_pipeline.py:650-803); a crashed training run restarts from
pretrained weights.  Here every training loop can periodically snapshot its
full TrainState (params, optimizer state, batch stats, step) and resume
exactly.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


def _manager(directory: str | Path, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        Path(directory).resolve(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_train_state(directory: str | Path, state: Any, step: int,
                     max_to_keep: int = 3, wait: bool = True) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()


def latest_step(directory: str | Path) -> int | None:
    mgr = _manager(directory)
    return mgr.latest_step()


def restore_train_state(directory: str | Path, template: Any, step: int | None = None):
    """Restore into the structure of ``template`` (a TrainState with the right
    shapes, e.g. freshly created). Returns (state, step) or (None, None)."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return None, None
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x,
        template,
    )
    state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    return state, step
