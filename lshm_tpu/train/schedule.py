"""Alternating-update groups and the published alpha/beta/gamma ramp as data.

The reference trains "three model groups alternately" by hand-editing the optimizer's
parameter list (reference: src/kharmonic_lofar.py:86-92) and ramps the loss weights
0.001 -> 0.01 -> 0.1 with an Adam -> LBFGS switch by re-running with edited constants
(reference: README.md:24-30).  Both become plain config here.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax

from lshm_tpu.config import RampStage

# model-group name -> top-level param-collection keys it owns
GROUP_KEYS = {
    "ae2d": ("ae2d",),
    "ae1d": ("aeT", "aeF", "aef"),
    "khm": ("khm",),
}


def group_mask(params: Any, group: str) -> Any:
    """Boolean pytree: True where the leaf belongs to ``group``.  ``group='all'`` is all-True."""
    if group == "all":
        return jax.tree.map(lambda _: True, params)
    keys = GROUP_KEYS[group]

    def mask_collection(col: dict) -> dict:
        return {
            name: jax.tree.map(lambda _: name in keys, sub)
            for name, sub in col.items()
        }

    return {k: mask_collection(v) for k, v in params.items()}


def active_group(schedule: Sequence[str], epoch: int) -> str:
    """Which group trains this epoch (cycled); 'all' when no schedule configured."""
    if not schedule:
        return "all"
    return schedule[epoch % len(schedule)]


def ramp_stage_for_epoch(ramp: Sequence[RampStage], epoch: int) -> RampStage | None:
    """Resolve the ramp stage covering ``epoch`` (stages are consecutive epoch spans);
    the last stage extends indefinitely.  None if no ramp configured."""
    if not ramp:
        return None
    e = 0
    for stage in ramp:
        e += stage.epochs
        if epoch < e:
            return stage
    return ramp[-1]
