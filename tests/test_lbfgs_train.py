"""L-BFGS ADMM train-step tests on the full cascade (small latent dims, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lshm_tpu.config import (
    Config, DataConfig, LBFGSConfig, LossConfig, ModelConfig, OptimConfig, TrainConfig,
)
from lshm_tpu.models import CascadedAE
from lshm_tpu.train import (
    LossWeights,
    init_lbfgs_train_state,
    make_lbfgs_train_step,
)


def make_cfg():
    return Config(
        data=DataConfig(batch_size=2, patch_size=128),
        model=ModelConfig(latent_dim=16, latent_dim_1d=8, num_clusters=4, rica=True),
        loss=LossConfig(),
        optim=OptimConfig(
            optimizer="lbfgs",
            lbfgs=LBFGSConfig(lr=1.0, max_iter=2, history_size=5,
                              line_search=True, batch_mode=True),
        ),
        train=TrainConfig(admm_iters=2),
    )


def make_batch(key, n=8):
    x = jax.random.normal(key, (n, 128, 128, 4))
    uv = jnp.repeat(jax.random.normal(jax.random.fold_in(key, 1), (n // 4, 2)), 4, axis=0)
    return x, uv


@pytest.mark.slow
def test_lbfgs_train_step_improves():
    cfg = make_cfg()
    model = CascadedAE(cfg=cfg.model)
    x, uv = make_batch(jax.random.PRNGKey(0))
    state = init_lbfgs_train_state(model, cfg, jax.random.PRNGKey(1), x, uv)
    step = make_lbfgs_train_step(model, cfg, num_groups=2, donate=False)
    w = LossWeights()
    first = None
    for _ in range(3):
        state, metrics = step(state, x, uv, w)
        if first is None:
            first = float(metrics["loss0"][0])
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))
    assert float(metrics["loss0"][-1]) < first
    assert int(state.opt_state.func_evals) > 0
    assert int(state.step) == 3


@pytest.mark.slow
def test_lbfgs_group_substitution_matches_masked_gradients():
    """The structural-freeze closure (frozen subtrees substituted with a loop-invariant
    snapshot, so XLA can hoist their forward out of the line searches) must reproduce
    the plain masked-gradient semantics bit-for-bit: the search direction is exactly
    zero in frozen leaves either way, so every probe sees numerically identical
    parameters."""
    from lshm_tpu.optim import lbfgs_init, make_lbfgs_step
    from lshm_tpu.train.objective import Duals, cascade_objective
    from lshm_tpu.train.schedule import group_mask

    cfg = make_cfg()
    model = CascadedAE(cfg=cfg.model)
    x, uv = make_batch(jax.random.PRNGKey(4), n=4)
    state = init_lbfgs_train_state(model, cfg, jax.random.PRNGKey(5), x, uv)
    params = state.params
    w = LossWeights()
    duals = Duals.zeros_like(x)

    def value_fn(p, x, uv, duals, w):
        return cascade_objective(model, p, x, uv, duals, w, 1,
                                 use_rica=cfg.model.rica,
                                 khm_order=cfg.model.khm_order)[0]

    group = "ae1d"

    # masked-gradient reference (the pre-substitution implementation)
    def vg_masked(p, x, uv, duals, w):
        v, g = jax.value_and_grad(value_fn)(p, x, uv, duals, w)
        m = group_mask(p, group)
        return v, jax.tree.map(
            lambda leaf, keep: leaf if keep else jnp.zeros_like(leaf), g, m
        )

    step_ref = jax.jit(make_lbfgs_step(vg_masked, value_fn, cfg.optim.lbfgs))
    res_ref = step_ref(params, lbfgs_init(params, cfg.optim.lbfgs), x, uv, duals, w)

    # structural-freeze path, as built by make_lbfgs_train_step(group=...)
    def subst(p, frozen):
        m = group_mask(p, group)
        return jax.tree.map(lambda v, fz, keep: v if keep else fz, p, frozen, m)

    def value_fn_g(p, x, uv, duals, w, frozen):
        return value_fn(subst(p, frozen), x, uv, duals, w)

    def vg_fn_g(p, x, uv, duals, w, frozen):
        return jax.value_and_grad(value_fn_g)(p, x, uv, duals, w, frozen)

    step_sub = jax.jit(make_lbfgs_step(vg_fn_g, value_fn_g, cfg.optim.lbfgs))
    res_sub = step_sub(params, lbfgs_init(params, cfg.optim.lbfgs), x, uv, duals, w,
                       params)

    for a, b in zip(jax.tree.leaves(res_ref.x), jax.tree.leaves(res_sub.x)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(res_ref.state.func_evals) == int(res_sub.state.func_evals)


@pytest.mark.slow
def test_lbfgs_group_masked_step():
    cfg = make_cfg()
    model = CascadedAE(cfg=cfg.model)
    x, uv = make_batch(jax.random.PRNGKey(2))
    state = init_lbfgs_train_state(model, cfg, jax.random.PRNGKey(3), x, uv)
    step = make_lbfgs_train_step(model, cfg, num_groups=2, group="khm", donate=False)
    new_state, _ = step(state, x, uv, LossWeights())
    p0 = state.params["params"]
    p1 = new_state.params["params"]
    # khm moved, AEs frozen
    assert np.abs(np.asarray(p1["khm"]["M"] - p0["khm"]["M"])).max() > 0
    for name in ("ae2d", "aeT", "aeF"):
        for a, b in zip(jax.tree.leaves(p0[name]), jax.tree.leaves(p1[name])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_lbfgs_admm_unroll_override_matches_scan():
    """TrainConfig.admm_unroll_lbfgs=False (the full_khm_lbfgs preset default: one
    lax.scan ADMM loop, admm_iters-independent compile) is numerically the same
    program as the default unrolled lowering."""
    import dataclasses

    cfg = make_cfg()
    assert cfg.train.admm_unroll and cfg.train.admm_unroll_lbfgs is None
    cfg_scan = cfg.replace(
        train=dataclasses.replace(cfg.train, admm_unroll_lbfgs=False))
    model = CascadedAE(cfg=cfg.model)
    x, uv = make_batch(jax.random.PRNGKey(0))
    state = init_lbfgs_train_state(model, cfg, jax.random.PRNGKey(1), x, uv)
    w = LossWeights()
    s1, m1 = make_lbfgs_train_step(model, cfg, num_groups=2, donate=False)(
        state, x, uv, w)
    s2, m2 = make_lbfgs_train_step(model, cfg_scan, num_groups=2, donate=False)(
        state, x, uv, w)
    assert m1["loss"].shape == m2["loss"].shape == (cfg.train.admm_iters,)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m2["loss"]),
                               rtol=1e-6)
    assert int(s1.opt_state.func_evals) == int(s2.opt_state.func_evals)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
