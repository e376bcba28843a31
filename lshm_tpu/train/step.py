"""Jitted ADMM training step.

One call = one minibatch = ``nadmm`` inner iterations of {optimizer update on the full
augmented-Lagrangian objective, then Lagrange-multiplier update}, exactly the structure of
the reference training loop (reference: src/kharmonic_lofar.py:115-202) — but compiled as
ONE XLA program (unrolled by default, ``lax.scan`` fallback — see ``admm_loop``): no
per-iteration host round trips, duals live in device memory, and metrics come back as
stacked [nadmm] arrays.  In the unrolled graph XLA CSEs the dual-update forward with the
next iteration's gradient forward, so each iteration costs one fwd+bwd
(benchmarks/profile_report.json: 36 forward convs per iteration = one forward).
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


def _input_cast(cfg: Config):
    """Input-batch cast for the full-bf16 data path.

    Under ``compute_dtype="bfloat16_full"`` the minibatch is cast to bf16 once at
    step entry; the cascade's ``astype(x.dtype)`` output casts and
    ``Duals.zeros_like(x)`` then keep the whole full-resolution path (AE outputs,
    residuals, duals, their cotangents) bf16 — halving the HBM traffic the
    flagship step is bound by.  Losses still accumulate in f32
    (lshm_tpu/losses.py::_f32); params and optimizer state stay f32."""
    if cfg.model.compute_dtype == "bfloat16_full":
        return lambda a: a.astype(jnp.bfloat16)
    return lambda a: a


def admm_loop(body, carry, nadmm: int, unroll: bool, xs=None):
    """Run the ADMM inner loop ``nadmm`` times: straight-line unrolled (default) or
    as one ``lax.scan``.

    Identical math; unrolled is ~6.4x faster per iteration on TPU v5e because the
    while-loop lowering pessimizes the body's layouts/fusion (decompose.py,
    2026-08-17: 12.3 vs 79 ms/iter at batch 420).  Returns (carry, stacked metrics)
    exactly like ``lax.scan``."""
    if unroll and nadmm > 0:
        ms = []
        for i in range(nadmm):
            carry, m = body(carry, None if xs is None else xs[i])
            ms.append(m)
        return carry, jax.tree.map(lambda *v: jnp.stack(v), *ms)
    # nadmm == 0 falls through: scan(length=0) returns empty stacked metrics
    return jax.lax.scan(body, carry, xs, length=nadmm)


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
    fused: bool = False,
) -> Callable:
    """Build the jitted minibatch step: (state, x, uv, weights) -> (state, metrics).

    ``num_groups`` = baselines per minibatch (static: defines augmentation grouping).
    Metrics are [nadmm]-stacked per-term losses matching the reference's per-closure log
    line (reference: src/kharmonic_lofar.py:176-181).

    ``fused=True`` restructures each ADMM iteration as ONE forward + vjp, sharing the
    forward between the dual update and the closure gradient (identical math,
    parity-tested; the trailing dual update after the last optimizer step is unobservable
    because duals reset per minibatch, reference: src/kharmonic_lofar.py:128-130).
    Measured on TPU v5e it is ~13% SLOWER than the default composed value_and_grad —
    the explicit vjp materializes cotangent buffers for every redundant output
    (x1/x11/x2/x3/xrecon), while XLA fuses the composed form's backward — so the default
    stays unfused; the path is kept as a documented negative result."""
    nadmm = cfg.train.admm_iters
    unroll = cfg.train.admm_unroll
    use_rica = cfg.model.rica
    khm_order = cfg.model.khm_order
    khm_backend = cfg.model.khm_backend
    cast_in = _input_cast(cfg)

    def objective(params, x, uv, duals, w):
        return cascade_objective(
            model, params, x, uv, duals, w, num_groups,
            use_rica=use_rica, khm_order=khm_order, khm_backend=khm_backend,
        )

    if cfg.train.remat:  # rematerialize the forward in the backward pass (HBM relief)
        objective = jax.checkpoint(objective)

    grad_fn = jax.value_and_grad(objective, has_aux=True)

    def train_step_unfused(state: TrainState, x, uv, w: LossWeights):
        x = cast_in(x)
        duals = Duals.zeros_like(x, fourier=cfg.model.fourier_variant)

        def admm_iter(carry, _):
            params, opt_state, duals = carry
            (_, metrics), grads = grad_fn(params, x, uv, duals, w)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            duals = dual_update(model, params, x, uv, duals, w.rho)
            return (params, opt_state, duals), metrics

        (params, opt_state, _), metrics = admm_loop(
            admm_iter, (state.params, state.opt_state, duals), nadmm, unroll
        )
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    from lshm_tpu.train.objective import dual_update_from_outputs, loss_from_outputs

    def forward(params, x, uv):
        out = model.apply(params, x, uv)
        return out, params["params"]["khm"]["M"]

    fwd = jax.checkpoint(forward) if cfg.train.remat else forward

    loss_grad = jax.value_and_grad(
        lambda out, M, x, duals, w: loss_from_outputs(
            out, M, x, duals, w, num_groups,
            use_rica=use_rica, khm_order=khm_order, khm_backend=khm_backend,
        ),
        argnums=(0, 1), has_aux=True,
    )

    def train_step_fused(state: TrainState, x, uv, w: LossWeights):
        x = cast_in(x)
        duals0 = Duals.zeros_like(x, fourier=cfg.model.fourier_variant)

        def admm_iter(carry, t):
            params, opt_state, duals = carry
            (out, M), vjp_fn = jax.vjp(lambda p: fwd(p, x, uv), params)
            # dual update with THIS iteration's params (skipped at t=0: duals are zero)
            new_duals = dual_update_from_outputs(out, x, duals, w.rho)
            gate = (t > 0).astype(x.dtype)
            duals = jax.tree.map(
                lambda n, o: gate * n + (1.0 - gate) * o, new_duals, duals
            )
            (_, metrics), (d_out, d_M) = loss_grad(out, M, x, duals, w)
            (grads,) = vjp_fn((d_out, d_M))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, duals), metrics

        (params, opt_state, _), metrics = admm_loop(
            admm_iter, (state.params, state.opt_state, duals0), nadmm, unroll,
            xs=jnp.arange(nadmm),
        )
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    train_step = train_step_fused if fused else train_step_unfused
    if not jit:
        return train_step  # raw function, e.g. for train_step_sharded to jit with shardings
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


class LBFGSTrainState(struct.PyTreeNode):
    """Train state for the L-BFGS path (params kept as a native pytree — an earlier
    flat-vector design paid ~15x per closure evaluation in ravel/unravel traffic)."""

    params: Any
    opt_state: Any                 # lshm_tpu.optim.LBFGSState
    step: jnp.ndarray


def init_lbfgs_train_state(
    model, cfg: Config, rng: jax.Array, sample_x: jnp.ndarray, sample_uv: jnp.ndarray
) -> "LBFGSTrainState":
    from lshm_tpu.optim import lbfgs_init

    params = model.init(rng, sample_x, sample_uv)
    return LBFGSTrainState(
        params=params,
        opt_state=lbfgs_init(params, cfg.optim.lbfgs),
        step=jnp.zeros((), jnp.int32),
    )


def make_lbfgs_train_step(
    model,
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

    Alternating groups are realized by zeroing the masked leaves of the gradient
    pytree, which confines every L-BFGS update to the active group's subspace."""
    from lshm_tpu.optim import make_lbfgs_step
    from lshm_tpu.train.schedule import group_mask

    nadmm = cfg.train.admm_iters
    unroll = (cfg.train.admm_unroll if cfg.train.admm_unroll_lbfgs is None
              else cfg.train.admm_unroll_lbfgs)
    use_rica = cfg.model.rica
    khm_order = cfg.model.khm_order
    khm_backend = cfg.model.khm_backend
    cast_in = _input_cast(cfg)

    def objective(params, x, uv, duals, w):
        return cascade_objective(
            model, params, x, uv, duals, w, num_groups,
            use_rica=use_rica, khm_order=khm_order, khm_backend=khm_backend,
        )

    if cfg.train.remat:  # rematerialize the forward in the backward pass (HBM relief)
        objective = jax.checkpoint(objective)

    def value_fn(params, x, uv, duals, w):
        return objective(params, x, uv, duals, w)[0]

    if group == "all":
        def vg_fn(params, x, uv, duals, w):
            return jax.value_and_grad(value_fn)(params, x, uv, duals, w)

        lbfgs_step = make_lbfgs_step(vg_fn, value_fn, cfg.optim.lbfgs)
    else:
        # Structural freeze: the closure substitutes the frozen groups' leaves with a
        # loop-invariant snapshot taken at minibatch entry, so (a) their gradient is
        # EXACTLY zero by construction (unused inputs), reproducing the old masked
        # semantics, and (b) the frozen subtrees' forward subgraphs have only
        # while-invariant operands — XLA's loop-invariant code motion hoists them out
        # of the line-search while loops and CSE dedups them with the entry forward.
        # For group="khm" that collapses every Armijo probe from a full cascade
        # forward (~3.3 ms at flagship size) to the KHM/similarity terms alone.
        def subst(params, frozen):
            m = group_mask(params, group)
            return jax.tree.map(
                lambda v, fz, keep: v if keep else fz, params, frozen, m
            )

        def value_fn_g(params, x, uv, duals, w, frozen):
            return value_fn(subst(params, frozen), x, uv, duals, w)

        def vg_fn_g(params, x, uv, duals, w, frozen):
            return jax.value_and_grad(value_fn_g)(params, x, uv, duals, w, frozen)

        lbfgs_step = make_lbfgs_step(vg_fn_g, value_fn_g, cfg.optim.lbfgs)

    def train_step(state: LBFGSTrainState, x, uv, w: LossWeights):
        x = cast_in(x)
        duals = Duals.zeros_like(x, fourier=cfg.model.fourier_variant)
        extra = () if group == "all" else (state.params,)

        def admm_iter(carry, _):
            params, opt_state, duals = carry
            res = lbfgs_step(params, opt_state, x, uv, duals, w, *extra)
            # one shared post-step forward for both logging metrics and the dual update
            metrics, duals = metrics_and_dual_update(
                model, res.x, x, uv, duals, w, num_groups,
                use_rica=use_rica, khm_order=khm_order, khm_backend=khm_backend,
            )
            return (res.x, res.state, duals), metrics

        (params, opt_state, _), metrics = admm_loop(
            admm_iter, (state.params, state.opt_state, duals), nadmm, unroll
        )
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
