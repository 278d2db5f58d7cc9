"""Resumable training state: params + optimizer state + step, via orbax.

`TTSTrainer.save` writes the MODEL in the serving checkpoint format
(safetensors) — that loses the optimizer moments, so a preempted run
restarts cold. This module checkpoints the FULL train state through
orbax's PyTree checkpointer (the JAX-ecosystem standard: per-leaf ocdbt
storage, works with sharded arrays on a mesh, optional async for
pod-scale runs where the save must overlap the next step).

The reference ships no training at all (SURVEY.md §0); this is the
checkpoint/resume half our trainer needs for production runs.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer(use_async: bool):
    import orbax.checkpoint as ocp

    handler = ocp.PyTreeCheckpointHandler()
    if use_async:
        return ocp.AsyncCheckpointer(handler)
    return ocp.Checkpointer(handler)


def save_train_state(path: str | Path, trainer, *, use_async: bool = False):
    """Write {params, opt_state, step} (+ history sidecar). With
    ``use_async=True`` the device->host copy happens now but the disk write
    overlaps subsequent steps; call ``wait_until_finished`` on the returned
    checkpointer (or just let the next save barrier) before relying on it."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    ckptr = _checkpointer(use_async)
    state = {
        "params": trainer.params,
        "opt_state": trainer.opt_state,
        "step": np.asarray(trainer.step_idx, np.int64),
    }
    ckptr.save((path / "state").resolve(), state, force=True)
    with open(path / "trainer.json", "w") as f:
        json.dump({"family": trainer.family, "step": trainer.step_idx,
                   "history": trainer.history}, f)
    return ckptr


def restore_train_state(path: str | Path, trainer) -> None:
    """Restore in place into a freshly-constructed ``TTSTrainer`` (same
    family/config/optimizer): params, optimizer moments, step counter and
    loss history. The trainer's existing pytrees are the restore target, so
    dtypes/shapes/structures (and shardings, when the trainer was built
    with a mesh) are preserved exactly."""
    import orbax.checkpoint as ocp

    path = Path(path)
    ckptr = _checkpointer(False)
    target = {
        "params": trainer.params,
        "opt_state": trainer.opt_state,
        "step": np.asarray(trainer.step_idx, np.int64),
    }
    restore_args = ocp.checkpoint_utils.construct_restore_args(target)
    restored = ckptr.restore(
        (path / "state").resolve(),
        args=ocp.args.PyTreeRestore(item=target, restore_args=restore_args),
    )
    trainer.params = restored["params"]
    trainer.opt_state = restored["opt_state"]
    trainer.step_idx = int(restored["step"])
    meta = json.loads((path / "trainer.json").read_text())
    if meta.get("family") != trainer.family:
        raise ValueError(
            f"checkpoint family {meta.get('family')!r} != trainer "
            f"{trainer.family!r}")
    trainer.history = list(meta.get("history", []))
