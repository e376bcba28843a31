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
