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
    if len(shape) != len(axis_names):
        raise ValueError(
            f"mesh shape {tuple(shape)} has {len(shape)} dim(s) but "
            f"{len(axis_names)} axis name(s) {tuple(axis_names)} — one per dim"
        )
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
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(state, sh)

    # multi-process: assemble global replicated arrays from the (identical) host copies
    def put(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(sh, a, a.shape)

    return jax.tree.map(put, state)


def make_train_step_shard_map(
    model, tx, cfg, num_groups: int, mesh: Mesh, axis: str = "data",
    donate: bool = True,
) -> Callable:
    """Explicit-SPMD alternative to the GSPMD path: shard_map over the patch batch with
    hand-placed ``pmean`` collectives on gradients and metrics.

    Every per-patch loss term is a (sum / global-numel) or batch-mean, and the
    augmentation groups are baseline-major with ``num_groups`` divisible by the mesh
    axis, so the global objective is exactly the mean of per-shard objectives — one
    gradient pmean per ADMM iteration is the only communication.  Optimizer updates run
    redundantly (replicated) on every device from the reduced gradients."""
    import jax.numpy as jnp

    from lshm_tpu.train.objective import Duals, cascade_objective, dual_update

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    ndev = mesh.shape[axis]
    assert num_groups % ndev == 0, "baselines per batch must divide the mesh axis"
    local_groups = num_groups // ndev
    nadmm = cfg.train.admm_iters
    use_rica = cfg.model.rica
    khm_order = cfg.model.khm_order

    def objective(params, x, uv, duals, w):
        return cascade_objective(
            model, params, x, uv, duals, w, local_groups,
            use_rica=use_rica, khm_order=khm_order,
        )

    grad_fn = jax.value_and_grad(objective, has_aux=True)

    def body(state, x_local, uv_local, w):
        import optax

        from lshm_tpu.train.step import _input_cast

        x_local = _input_cast(cfg)(x_local)
        duals = Duals.zeros_like(x_local, fourier=cfg.model.fourier_variant)

        def admm_iter(carry, _):
            params, opt_state, duals = carry
            (_, metrics), grads = grad_fn(params, x_local, uv_local, duals, w)
            grads = jax.lax.pmean(grads, axis)           # the one collective
            metrics = jax.lax.pmean(metrics, axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            duals = dual_update(model, params, x_local, uv_local, duals, w.rho)
            return (params, opt_state, duals), metrics

        from lshm_tpu.train.step import admm_loop

        (params, opt_state, _), metrics = admm_loop(
            admm_iter, (state.params, state.opt_state, duals), nadmm,
            cfg.train.admm_unroll,
        )
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    from jax.sharding import PartitionSpec as PS

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(PS(), PS(axis), PS(axis), PS()),
        out_specs=(PS(), PS()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


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
