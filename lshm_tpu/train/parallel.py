"""Data-parallel training over a device mesh.

The reference is strictly single-device (SURVEY.md §2: no distributed backend anywhere).
This module adds the TPU-native scaling path: a ``jax.sharding.Mesh`` over the ICI, the
patch batch sharded on a ``data`` axis, parameters/optimizer state replicated, and XLA's
GSPMD partitioner inserting the gradient ``psum``s automatically from the sharding
annotations.  Works identically on a v5e-8 slice and on 8 virtual CPU devices
(``--xla_force_host_platform_device_count=8``) for hermetic tests.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int] = (-1,), axis_names: Sequence[str] = ("data",),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Mesh over all (or the given) devices; -1 in ``shape`` absorbs the remainder."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = len(devs) // known
    return Mesh(devs.reshape(shape), axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim (patch-batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, x, uv, axis: str = "data"):
    """Place a host minibatch onto the mesh, batch dim sharded across ``axis``."""
    sh = batch_sharding(mesh, axis)
    return jax.device_put(x, sh), jax.device_put(uv, sh)


def replicate_state(mesh: Mesh, state: Any) -> Any:
    return jax.device_put(state, replicated(mesh))


def train_step_sharded(
    train_step: Callable, mesh: Mesh, axis: str = "data", donate: bool = True
) -> Callable:
    """Wrap a (state, x, uv, weights) train step with explicit input/output shardings:
    state + weights replicated, batch sharded.  GSPMD turns the batch-reduction in every
    loss term into an ICI all-reduce; nothing else changes."""
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
