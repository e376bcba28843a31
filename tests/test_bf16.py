"""bfloat16 compute-dtype path: params stay f32, outputs return f32, training step runs
and produces finite losses close to the f32 path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lshm_tpu.config import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig
from lshm_tpu.models import CascadedAE
from lshm_tpu.train import LossWeights, init_train_state, make_train_step


def _cfg(dtype):
    return Config(
        data=DataConfig(batch_size=2, patch_size=128),
        model=ModelConfig(latent_dim=16, latent_dim_1d=8, num_clusters=4, rica=True,
                          compute_dtype=dtype),
        optim=OptimConfig(optimizer="adam", adam_lr=1e-3),
        train=TrainConfig(admm_iters=1),
    )


@pytest.mark.slow
def test_bf16_forward_close_to_f32_and_params_f32():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 128, 4))
    uv = jnp.ones((2, 2))

    m32 = CascadedAE(cfg=_cfg("float32").model)
    m16 = CascadedAE(cfg=_cfg("bfloat16").model)
    params = m32.init(jax.random.PRNGKey(1), x, uv)
    # same params work in both (compute dtype is activation-only)
    out32 = m32.apply(params, x, uv)
    out16 = m16.apply(params, x, uv)
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32
    assert out16.xrecon.dtype == jnp.float32     # upcast at module boundary
    # bf16 has ~3 decimal digits; outputs should agree coarsely
    scale = float(jnp.abs(out32.xrecon).max())
    diff = float(jnp.abs(out32.xrecon - out16.xrecon).max())
    assert diff < 0.15 * scale + 0.1, (diff, scale)


@pytest.mark.slow
def test_bf16_loss_terms_close_to_f32():
    """Accuracy gate for the bf16 benchmark path: every loss term of the first ADMM
    iteration must agree with f32 within bf16 resolution."""
    from lshm_tpu.train.objective import Duals, cascade_objective

    x = jax.random.normal(jax.random.PRNGKey(5), (4, 128, 128, 4))
    uv = jnp.repeat(jax.random.normal(jax.random.PRNGKey(6), (2, 2)), 2, axis=0)
    m32 = CascadedAE(cfg=_cfg("float32").model)
    m16 = CascadedAE(cfg=_cfg("bfloat16").model)
    params = m32.init(jax.random.PRNGKey(7), x, uv)
    duals = Duals.zeros(x.size)
    w = LossWeights()
    _, t32 = cascade_objective(m32, params, x, uv, duals, w, 2)
    _, t16 = cascade_objective(m16, params, x, uv, duals, w, 2)
    for k in t32:
        a, b = float(t32[k]), float(t16[k])
        assert abs(a - b) <= 0.05 * abs(a) + 5e-3, (k, a, b)


@pytest.mark.slow
def test_bf16_nmi_vs_f32(synth_h5):
    """NMI gate: soft cluster assignments from the bf16 cascade must match the f32
    assignments on the synthetic SAP (the BASELINE.md parity statistic)."""
    import numpy as np

    from lshm_tpu.eval import baseline_distance_matrix, nmi

    cfg32 = _cfg("float32").model
    import dataclasses

    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    m32, m16 = CascadedAE(cfg=cfg32), CascadedAE(cfg=cfg16)
    params = m32.init(jax.random.PRNGKey(8), jnp.zeros((1, 128, 128, 4)),
                      jnp.zeros((1, 2)))
    X32, _ = baseline_distance_matrix(m32, params, synth_h5, "0", baselines_per_batch=5)
    X16, _ = baseline_distance_matrix(m16, params, synth_h5, "0", baselines_per_batch=5)
    soft32 = np.argmin(X32, axis=0)
    soft16 = np.argmin(X16, axis=0)
    assert nmi(soft32, soft16) >= 0.95, (soft32, soft16)


@pytest.mark.slow
def test_bf16_train_step_finite():
    cfg = _cfg("bfloat16")
    model = CascadedAE(cfg=cfg.model)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 128, 128, 4))
    uv = jnp.repeat(jax.random.normal(jax.random.PRNGKey(3), (1, 2)), 4, axis=0)
    state, tx = init_train_state(model, cfg, jax.random.PRNGKey(4), x, uv)
    step = make_train_step(model, tx, cfg, num_groups=1, donate=False)
    state, metrics = step(state, x, uv, LossWeights())
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32


@pytest.mark.slow
def test_bf16_full_loss_terms_close_to_f32():
    """Accuracy gate for the bfloat16_full benchmark headline: every per-term loss of
    the first ADMM iteration agrees with f32 within bf16 resolution even though the
    input batch, AE outputs, residuals and duals are all stored bf16 (losses
    accumulate in f32 via lshm_tpu.losses._f32)."""
    from lshm_tpu.train.objective import Duals, cascade_objective

    x = jax.random.normal(jax.random.PRNGKey(5), (4, 128, 128, 4))
    uv = jnp.repeat(jax.random.normal(jax.random.PRNGKey(6), (2, 2)), 2, axis=0)
    m32 = CascadedAE(cfg=_cfg("float32").model)
    mf = CascadedAE(cfg=_cfg("bfloat16_full").model)
    params = m32.init(jax.random.PRNGKey(7), x, uv)
    w = LossWeights()
    _, t32 = cascade_objective(m32, params, x, uv, Duals.zeros_like(x), w, 2)
    xb = x.astype(jnp.bfloat16)
    _, tf = cascade_objective(mf, params, xb, uv, Duals.zeros_like(xb), w, 2)
    for k in t32:
        a, b = float(t32[k]), float(tf[k])
        assert np.isfinite(b), k
        assert abs(a - b) <= 0.05 * abs(a) + 5e-3, (k, a, b)


@pytest.mark.slow
def test_lbfgs_bf16_tracks_f32():
    """Accuracy gate for the full_khm_lbfgs preset's mixed-precision closure
    (compute_dtype="bfloat16": bf16 conv/dense activations, f32 residual/loss path).
    The Armijo sufficient-decrease test compares f32 losses, so the line-search
    trajectory is PRESERVED up to the small f32-loss perturbation bf16 activations
    introduce: a borderline accept can flip (measured +/-1 func_eval on small probes,
    identical at flagship dims), but nothing like bfloat16_full's 6.8x func_evals
    blowup from bf16 loss noise (benchmarks/PERF_NOTES.md).  Gate: cumulative
    func_evals within a +/-2 band of f32, per-step losses within bf16 activation
    tolerance, params stay f32."""
    import dataclasses

    from lshm_tpu.train import init_lbfgs_train_state, make_lbfgs_train_step

    x = jax.random.normal(jax.random.PRNGKey(2), (4, 128, 128, 4))
    uv = jnp.repeat(jax.random.normal(jax.random.PRNGKey(3), (1, 2)), 4, axis=0)
    traj, evals = {}, {}
    for dtype in ("float32", "bfloat16"):
        cfg = _cfg(dtype)
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, optimizer="lbfgs"))
        model = CascadedAE(cfg=cfg.model)
        state = init_lbfgs_train_state(model, cfg, jax.random.PRNGKey(4), x, uv)
        step = make_lbfgs_train_step(model, cfg, num_groups=1, donate=False)
        losses = []
        for _ in range(2):
            state, metrics = step(state, x, uv, LossWeights())
            assert np.all(np.isfinite(np.asarray(metrics["loss"])))
            losses.append(float(metrics["loss"][-1]))
        traj[dtype] = losses
        evals[dtype] = int(jax.device_get(state.opt_state.func_evals))
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32
    assert abs(evals["float32"] - evals["bfloat16"]) <= 2, evals
    for a, b in zip(traj["float32"], traj["bfloat16"]):
        assert abs(a - b) <= 0.02 * abs(a) + 5e-3, traj


@pytest.mark.slow
def test_bf16_full_training_tracks_f32():
    """Multi-step gate: a few full ADMM steps under bfloat16_full produce finite,
    decreasing losses tracking the f32 trajectory within bf16 tolerance, while the
    params and optimizer state stay f32 (mixed precision with f32 master weights)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 128, 128, 4))
    uv = jnp.repeat(jax.random.normal(jax.random.PRNGKey(3), (1, 2)), 4, axis=0)
    import dataclasses

    traj = {}
    for dtype in ("float32", "bfloat16_full"):
        cfg = _cfg(dtype)
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, admm_iters=2))
        model = CascadedAE(cfg=cfg.model)
        state, tx = init_train_state(model, cfg, jax.random.PRNGKey(4), x, uv)
        step = make_train_step(model, tx, cfg, num_groups=1, donate=False)
        losses = []
        for _ in range(3):
            state, metrics = step(state, x, uv, LossWeights())
            assert np.all(np.isfinite(np.asarray(metrics["loss"])))
            losses.append(float(metrics["loss"][-1]))
        traj[dtype] = losses
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32
        assert losses[-1] < losses[0], (dtype, losses)
    for a, b in zip(traj["float32"], traj["bfloat16_full"]):
        assert abs(a - b) <= 0.02 * abs(a) + 5e-3, traj
