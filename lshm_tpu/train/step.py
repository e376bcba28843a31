"""Jitted ADMM training step.

One call = one minibatch = ``nadmm`` inner iterations of {optimizer update on the full
augmented-Lagrangian objective, then Lagrange-multiplier update}, exactly the structure of
the reference training loop (reference: src/kharmonic_lofar.py:115-202) — but compiled as a
single XLA program via ``lax.scan``: no per-iteration host round trips, duals live in
device memory, and metrics come back as stacked [nadmm] arrays.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from lshm_tpu.config import Config
from lshm_tpu.train.objective import (
    Duals,
    LossWeights,
    cascade_objective,
    dual_update,
    metrics_and_dual_update,
)


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: Config, params: Any, group: str = "all") -> optax.GradientTransformation:
    """Adam (optionally restricted to one model group, the config equivalent of the
    reference's hand-edited parameter list at src/kharmonic_lofar.py:86-92): frozen
    groups get set_to_zero updates.  The LBFGS path is built in lshm_tpu/optim."""
    from lshm_tpu.train.schedule import group_mask

    tx = optax.adam(cfg.optim.adam_lr)
    if group != "all":
        mask = group_mask(params, group)
        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


def init_train_state(
    model, cfg: Config, rng: jax.Array, sample_x: jnp.ndarray, sample_uv: jnp.ndarray,
    group: str = "all",
) -> tuple[TrainState, optax.GradientTransformation]:
    params = model.init(rng, sample_x, sample_uv)
    tx = make_optimizer(cfg, params, group)
    return (
        TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)),
        tx,
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: Config,
    num_groups: int,
    donate: bool = True,
    jit: bool = True,
) -> Callable:
    """Build the jitted minibatch step: (state, x, uv, weights) -> (state, metrics).

    ``num_groups`` = baselines per minibatch (static: defines augmentation grouping).
    Metrics are [nadmm]-stacked per-term losses matching the reference's per-closure log
    line (reference: src/kharmonic_lofar.py:176-181).
    """
    nadmm = cfg.train.admm_iters
    use_rica = cfg.model.rica
    khm_order = cfg.model.khm_order
    khm_backend = cfg.model.khm_backend

    def objective(params, x, uv, duals, w):
        return cascade_objective(
            model, params, x, uv, duals, w, num_groups,
            use_rica=use_rica, khm_order=khm_order, khm_backend=khm_backend,
        )

    if cfg.train.remat:  # rematerialize the forward in the backward pass (HBM relief)
        objective = jax.checkpoint(objective)

    grad_fn = jax.value_and_grad(objective, has_aux=True)

    def train_step(state: TrainState, x: jnp.ndarray, uv: jnp.ndarray, w: LossWeights):
        duals = Duals.zeros(x.size, x.dtype)

        def admm_iter(carry, _):
            params, opt_state, duals = carry
            (_, metrics), grads = grad_fn(params, x, uv, duals, w)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            duals = dual_update(model, params, x, uv, duals, w.rho)
            return (params, opt_state, duals), metrics

        (params, opt_state, _), metrics = jax.lax.scan(
            admm_iter, (state.params, state.opt_state, duals), None, length=nadmm
        )
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    if not jit:
        return train_step  # raw function, e.g. for train_step_sharded to jit with shardings
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


class LBFGSTrainState(struct.PyTreeNode):
    """Train state for the L-BFGS path: parameters live as one flat vector."""

    flat_params: jnp.ndarray
    opt_state: Any                 # lshm_tpu.optim.LBFGSState
    step: jnp.ndarray


def init_lbfgs_train_state(
    model, cfg: Config, rng: jax.Array, sample_x: jnp.ndarray, sample_uv: jnp.ndarray
):
    """Returns (state, unravel_fn).  ``unravel_fn`` is static and must be passed to
    ``make_lbfgs_train_step``."""
    from jax.flatten_util import ravel_pytree

    from lshm_tpu.optim import lbfgs_init

    params = model.init(rng, sample_x, sample_uv)
    flat, unravel = ravel_pytree(params)
    state = LBFGSTrainState(
        flat_params=flat,
        opt_state=lbfgs_init(flat.size, cfg.optim.lbfgs, flat.dtype),
        step=jnp.zeros((), jnp.int32),
    )
    return state, unravel


def make_lbfgs_train_step(
    model,
    unravel,
    cfg: Config,
    num_groups: int,
    group: str = "all",
    donate: bool = True,
    jit: bool = True,
):
    """L-BFGS minibatch step: each of the ``nadmm`` inner iterations runs one full
    ``optimizer.step(closure)`` (up to max_iter L-BFGS iterations with line search, all
    on-device) followed by the dual update — the structure of the reference's LBFGS
    training mode (reference: src/kharmonic_lofar.py:93,131-202).

    Alternating groups are realized by zeroing the masked coordinates of the flat
    gradient, which confines every L-BFGS update to the active group's subspace."""
    from jax.flatten_util import ravel_pytree

    from lshm_tpu.optim import make_lbfgs_step
    from lshm_tpu.train.schedule import group_mask

    nadmm = cfg.train.admm_iters
    use_rica = cfg.model.rica
    khm_order = cfg.model.khm_order
    khm_backend = cfg.model.khm_backend

    def objective(params, x, uv, duals, w):
        return cascade_objective(
            model, params, x, uv, duals, w, num_groups,
            use_rica=use_rica, khm_order=khm_order, khm_backend=khm_backend,
        )

    if cfg.train.remat:  # rematerialize the forward in the backward pass (HBM relief)
        objective = jax.checkpoint(objective)

    # flat {0,1} mask for the active group: ravel a pytree of ones/zeros per leaf
    def flat_group_mask(sample_flat: jnp.ndarray) -> jnp.ndarray:
        params = unravel(sample_flat)
        mask_tree = group_mask(params, group)
        ones = jax.tree.map(
            lambda leaf, m: jnp.full(jnp.shape(leaf), 1.0 if m else 0.0, sample_flat.dtype),
            params, mask_tree,
        )
        return ravel_pytree(ones)[0]

    def value_fn(flat, x, uv, duals, w):
        return objective(unravel(flat), x, uv, duals, w)[0]

    if group == "all":
        def vg_fn(flat, x, uv, duals, w):
            return jax.value_and_grad(value_fn)(flat, x, uv, duals, w)
    else:
        def vg_fn(flat, x, uv, duals, w):
            v, g = jax.value_and_grad(value_fn)(flat, x, uv, duals, w)
            return v, g * flat_group_mask(flat)

    lbfgs_step = make_lbfgs_step(vg_fn, value_fn, cfg.optim.lbfgs)

    def train_step(state: LBFGSTrainState, x, uv, w: LossWeights):
        duals = Duals.zeros(x.size, x.dtype)

        def admm_iter(carry, _):
            flat, opt_state, duals = carry
            res = lbfgs_step(flat, opt_state, x, uv, duals, w)
            params = unravel(res.x)
            # one shared post-step forward for both logging metrics and the dual update
            metrics, duals = metrics_and_dual_update(
                model, params, x, uv, duals, w, num_groups,
                use_rica=use_rica, khm_order=khm_order, khm_backend=khm_backend,
            )
            return (res.x, res.state, duals), metrics

        (flat, opt_state, _), metrics = jax.lax.scan(
            admm_iter, (state.flat_params, state.opt_state, duals), None, length=nadmm
        )
        return (
            state.replace(flat_params=flat, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
