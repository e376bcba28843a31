"""Unified checkpointing (orbax) — replaces the reference's four ad-hoc torch.save files.

The reference saves four separate ``{'model_state_dict': ...}`` pickles and never
checkpoints optimizer state or data RNG (reference: src/kharmonic_lofar.py:210-222).
Here a single orbax checkpoint carries the whole train state (params + optimizer state +
step) plus arbitrary extras (data-sampler seed, loss-weight stage), giving exact resume.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def _manager(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir))


def save_checkpoint(ckpt_dir: str, state: Any, step: int, extras: dict | None = None) -> None:
    """``extras`` (config dicts, provenance strings, ...) go to a JSON sidecar — orbax's
    array checkpointer does not take strings."""
    import json

    os.makedirs(ckpt_dir, exist_ok=True)
    with _manager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave({"state": state}))
        mgr.wait_until_finished()
    if extras:
        with open(os.path.join(ckpt_dir, f"extras_{step}.json"), "w") as f:
            json.dump(extras, f, indent=2, default=str)


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    with _manager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, template: Any, step: int | None = None) -> tuple[Any, dict | None]:
    """Restore (state, extras); ``template`` is a pytree with the target structure
    (e.g. a freshly initialized TrainState)."""
    import json

    with _manager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        out = mgr.restore(step, args=ocp.args.StandardRestore({"state": template}))
    extras = None
    sidecar = os.path.join(ckpt_dir, f"extras_{step}.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            extras = json.load(f)
    return out["state"], extras
