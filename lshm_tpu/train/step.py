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
from lshm_tpu.train.objective import Duals, LossWeights, cascade_objective, dual_update


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

    def objective(params, x, uv, duals, w):
        return cascade_objective(
            model, params, x, uv, duals, w, num_groups,
            use_rica=use_rica, khm_order=khm_order,
        )

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
