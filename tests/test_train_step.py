"""End-to-end train-step tests: the jitted ADMM step runs, losses are finite and decrease,
group masking freezes the right parameters, and the sharded step matches single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lshm_tpu.config import Config, DataConfig, LossConfig, ModelConfig, OptimConfig, TrainConfig
from lshm_tpu.models import CascadedAE
from lshm_tpu.train import (
    LossWeights,
    group_mask,
    init_train_state,
    make_mesh,
    make_train_step,
)
from lshm_tpu.train.parallel import replicate_state


def tiny_config(**model_kw) -> Config:
    return Config(
        data=DataConfig(batch_size=2, patch_size=128),
        model=ModelConfig(latent_dim=16, latent_dim_1d=8, num_clusters=4, rica=True, **model_kw),
        loss=LossConfig(),
        optim=OptimConfig(optimizer="adam", adam_lr=1e-3),
        train=TrainConfig(admm_iters=2),
    )


def make_batch(key, n=8):
    x = jax.random.normal(key, (n, 128, 128, 4))
    uv = jax.random.normal(jax.random.fold_in(key, 1), (n // 4, 2))
    uv = jnp.repeat(uv, 4, axis=0)  # baseline-major groups of 4
    return x, uv


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = CascadedAE(cfg=cfg.model)
    x, uv = make_batch(jax.random.PRNGKey(0))
    state, tx = init_train_state(model, cfg, jax.random.PRNGKey(1), x, uv)
    return cfg, model, x, uv, state, tx


def test_train_step_runs_and_improves(setup):
    cfg, model, x, uv, state, tx = setup
    step = make_train_step(model, tx, cfg, num_groups=2, donate=False)
    w = LossWeights()
    metrics_first = None
    for i in range(6):
        state, metrics = step(state, x, uv, w)
        if metrics_first is None:
            metrics_first = metrics
    # metrics stacked over admm iters
    assert metrics["loss"].shape == (cfg.train.admm_iters,)
    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # total recon loss (loss0) must drop vs the very first evaluation
    assert float(metrics["loss0"][-1]) < float(metrics_first["loss0"][0])
    assert int(state.step) == 6


def test_group_mask_structure(setup):
    cfg, model, x, uv, state, tx = setup
    m = group_mask(state.params, "ae2d")
    flat = jax.tree_util.tree_flatten_with_path(m)[0]
    for path, val in flat:
        names = [getattr(p, "key", "") for p in path]
        assert val == ("ae2d" in names)
    m1d = group_mask(state.params, "ae1d")
    flat = jax.tree_util.tree_flatten_with_path(m1d)[0]
    for path, val in flat:
        names = [getattr(p, "key", "") for p in path]
        assert val == (("aeT" in names) or ("aeF" in names))


def test_masked_step_freezes_other_groups(setup):
    cfg, model, x, uv, _, _ = setup
    state, tx = init_train_state(model, cfg, jax.random.PRNGKey(2), x, uv, group="khm")
    step = make_train_step(model, tx, cfg, num_groups=2, donate=False)
    new_state, _ = step(state, x, uv, LossWeights())
    # khm centroids moved
    dM = np.abs(
        np.asarray(new_state.params["params"]["khm"]["M"] - state.params["params"]["khm"]["M"])
    ).max()
    assert dM > 0
    # ae2d untouched
    for name in ("ae2d", "aeT", "aeF"):
        before = jax.tree.leaves(state.params["params"][name])
        after = jax.tree.leaves(new_state.params["params"][name])
        for a, b in zip(before, after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fourier_variant_step():
    cfg = tiny_config(fourier_variant=True, latent_dim_fourier=8)
    model = CascadedAE(cfg=cfg.model)
    x, uv = make_batch(jax.random.PRNGKey(3))
    state, tx = init_train_state(model, cfg, jax.random.PRNGKey(4), x, uv)
    step = make_train_step(model, tx, cfg, num_groups=2, donate=False)
    state, metrics = step(state, x, uv, LossWeights())
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))


@pytest.mark.slow
def test_fourier_sharded_step_matches_single_device():
    """The legacy Fourier variant (full-residual duals sized 2*numel) under the GSPMD
    data-parallel path must match the single-device step."""
    from lshm_tpu.train.parallel import shard_batch, train_step_sharded

    cfg = tiny_config(fourier_variant=True, latent_dim_fourier=8)
    model = CascadedAE(cfg=cfg.model)
    x, uv = make_batch(jax.random.PRNGKey(5))
    state, tx = init_train_state(model, cfg, jax.random.PRNGKey(6), x, uv)
    mesh = make_mesh((8,), ("data",))
    raw = make_train_step(model, tx, cfg, num_groups=2, donate=False, jit=False)

    single = make_train_step(model, tx, cfg, num_groups=2, donate=False)
    s1, m1 = single(state, x, uv, LossWeights())

    sharded = train_step_sharded(raw, mesh, donate=False)
    xs, uvs = shard_batch(mesh, x, uv)
    s2, m2 = sharded(replicate_state(mesh, state), xs, uvs,
                     replicate_state(mesh, LossWeights()))
    np.testing.assert_allclose(
        np.asarray(m1["loss"]), np.asarray(m2["loss"]), rtol=2e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.slow
def test_sharded_step_matches_single_device(setup):
    from lshm_tpu.train.parallel import shard_batch, train_step_sharded

    cfg, model, x, uv, state, tx = setup
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh((8,), ("data",))
    raw = make_train_step(model, tx, cfg, num_groups=2, donate=False, jit=False)

    single = make_train_step(model, tx, cfg, num_groups=2, donate=False)
    s1, m1 = single(state, x, uv, LossWeights())

    sharded = train_step_sharded(raw, mesh, donate=False)
    xs, uvs = shard_batch(mesh, x, uv)
    st = replicate_state(mesh, state)
    s2, m2 = sharded(st, xs, uvs, replicate_state(mesh, LossWeights()))
    np.testing.assert_allclose(
        np.asarray(m1["loss"]), np.asarray(m2["loss"]), rtol=2e-4
    )
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.slow
def test_lbfgs_sharded_step_matches_single_device(setup):
    """Distributed stochastic L-BFGS via GSPMD: the whole step — two-loop recursion,
    on-device line searches included — partitions over the data mesh (every loss/grad
    reduction becomes an all-reduce, so line-search decisions are bitwise-identical on
    all shards) and must match the single-device trajectory."""
    from lshm_tpu.train.parallel import shard_batch, train_step_sharded
    from lshm_tpu.train.step import init_lbfgs_train_state, make_lbfgs_train_step

    cfg, model, x, uv, _, _ = setup
    state = init_lbfgs_train_state(model, cfg, jax.random.PRNGKey(7), x, uv)
    mesh = make_mesh((8,), ("data",))

    single = make_lbfgs_train_step(model, cfg, num_groups=2, donate=False)
    s1, m1 = single(state, x, uv, LossWeights())

    raw = make_lbfgs_train_step(model, cfg, num_groups=2, donate=False, jit=False)
    sharded = train_step_sharded(raw, mesh, donate=False)
    xs, uvs = shard_batch(mesh, x, uv)
    s2, m2 = sharded(replicate_state(mesh, state), xs, uvs,
                     replicate_state(mesh, LossWeights()))
    np.testing.assert_allclose(
        np.asarray(m1["loss"]), np.asarray(m2["loss"]), rtol=2e-4
    )
    assert int(s1.opt_state.func_evals) == int(s2.opt_state.func_evals)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_ramp_schedule():
    from lshm_tpu.config import RampStage
    from lshm_tpu.train.schedule import active_group, ramp_stage_for_epoch

    ramp = (
        RampStage(epochs=2, alpha=0.001, optimizer="adam"),
        RampStage(epochs=2, alpha=0.01, optimizer="lbfgs"),
        RampStage(epochs=1, alpha=0.1, optimizer="lbfgs"),
    )
    assert ramp_stage_for_epoch(ramp, 0).alpha == 0.001
    assert ramp_stage_for_epoch(ramp, 1).alpha == 0.001
    assert ramp_stage_for_epoch(ramp, 2).optimizer == "lbfgs"
    assert ramp_stage_for_epoch(ramp, 4).alpha == 0.1
    assert ramp_stage_for_epoch(ramp, 99).alpha == 0.1  # last stage extends
    assert ramp_stage_for_epoch((), 0) is None

    sched = ("ae2d", "ae1d", "khm")
    assert [active_group(sched, e) for e in range(4)] == ["ae2d", "ae1d", "khm", "ae2d"]
    assert active_group((), 5) == "all"


@pytest.mark.slow
def test_remat_step_matches(setup):
    """remat=True must not change results, only memory/FLOPs trade-off."""
    import dataclasses

    from lshm_tpu.config import TrainConfig

    cfg, model, x, uv, state, tx = setup
    cfg_r = cfg.replace(train=dataclasses.replace(cfg.train, remat=True))
    step = make_train_step(model, tx, cfg, num_groups=2, donate=False)
    step_r = make_train_step(model, tx, cfg_r, num_groups=2, donate=False)
    w = LossWeights()
    s1, m1 = step(state, x, uv, w)
    s2, m2 = step_r(state, x, uv, w)
    np.testing.assert_allclose(
        np.asarray(m1["loss"]), np.asarray(m2["loss"]), rtol=1e-5
    )


@pytest.mark.slow
def test_8channel_cascade():
    """Full 8-channel (all four polarizations) mode end-to-end."""
    cfg = Config(
        data=DataConfig(batch_size=1, patch_size=128, num_channels=8),
        model=ModelConfig(latent_dim=16, latent_dim_1d=8, num_clusters=3,
                          num_channels=8, rica=True),
        optim=OptimConfig(optimizer="adam", adam_lr=1e-3),
        train=TrainConfig(admm_iters=1),
    )
    model = CascadedAE(cfg=cfg.model)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 128, 128, 8))
    uv = jnp.repeat(jax.random.normal(jax.random.PRNGKey(1), (1, 2)), 4, axis=0)
    state, tx = init_train_state(model, cfg, jax.random.PRNGKey(2), x, uv)
    step = make_train_step(model, tx, cfg, num_groups=1, donate=False)
    state, metrics = step(state, x, uv, LossWeights())
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))


def test_config_channel_mismatch_rejected():
    with pytest.raises(AssertionError):
        Config(
            data=DataConfig(num_channels=8),
            model=ModelConfig(num_channels=4),
        )


@pytest.mark.slow
def test_sharded_step_contains_allreduce(setup):
    """GSPMD must turn the batch-reduced losses into cross-device all-reduces."""
    from lshm_tpu.train.parallel import (
        batch_sharding, replicated, shard_batch, train_step_sharded,
    )

    cfg, model, x, uv, state, tx = setup
    mesh = make_mesh((8,), ("data",))
    raw = make_train_step(model, tx, cfg, num_groups=2, donate=False, jit=False)
    step = train_step_sharded(raw, mesh, donate=False)
    xs, uvs = shard_batch(mesh, x, uv)
    st = replicate_state(mesh, state)
    w = replicate_state(mesh, LossWeights())
    hlo = step.lower(st, xs, uvs, w).compile().as_text()
    assert "all-reduce" in hlo, "expected cross-device gradient reduction"


@pytest.mark.slow
def test_shard_map_step_matches_single_device(setup):
    """Explicit-collective shard_map path must agree with the single-device step."""
    from lshm_tpu.train.parallel import (
        make_train_step_shard_map, replicate_state, shard_batch,
    )

    cfg, model, x, uv, state, tx = setup
    mesh = make_mesh((2,), ("data",), devices=jax.devices()[:2])  # 1 group per device
    single = make_train_step(model, tx, cfg, num_groups=2, donate=False)
    s1, m1 = single(state, x, uv, LossWeights())

    step = make_train_step_shard_map(model, tx, cfg, num_groups=2, mesh=mesh,
                                     donate=False)
    xs, uvs = shard_batch(mesh, x, uv)
    st = replicate_state(mesh, state)
    s2, m2 = step(st, xs, uvs, replicate_state(mesh, LossWeights()))
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m2["loss"]), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.slow
def test_fused_step_matches_unfused(setup):
    """The fused (one fwd+vjp per ADMM iter) step must reproduce the reference-ordered
    unfused sequence exactly."""
    cfg, model, x, uv, state, tx = setup
    step_u = make_train_step(model, tx, cfg, num_groups=2, donate=False, fused=False)
    step_f = make_train_step(model, tx, cfg, num_groups=2, donate=False, fused=True)
    w = LossWeights()
    s1, m1 = step_u(state, x, uv, w)
    s2, m2 = step_f(state, x, uv, w)
    for k in m1:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_admm_unroll_matches_scan(setup):
    """TrainConfig.admm_unroll (straight-line inner loop; 6.4x faster on TPU per
    benchmarks/PERF_NOTES.md) is numerically the same program as the lax.scan path."""
    import dataclasses

    cfg, model, x, uv, state, tx = setup
    assert cfg.train.admm_unroll  # unrolled is the default
    cfg_scan = cfg.replace(train=dataclasses.replace(cfg.train, admm_unroll=False))
    w = LossWeights()
    s1, m1 = make_train_step(model, tx, cfg, num_groups=2, donate=False)(state, x, uv, w)
    s2, m2 = make_train_step(model, tx, cfg_scan, num_groups=2, donate=False)(state, x, uv, w)
    assert m1["loss"].shape == m2["loss"].shape == (cfg.train.admm_iters,)
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m2["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        # scan vs straight-line programs fuse/round differently; after 2 Adam
        # steps the divergence reaches ~1e-5 on isolated params (a logic bug
        # would be orders of magnitude larger)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_admm_loop_zero_iters():
    """nadmm=0 must not crash in the unrolled path: it falls through to
    lax.scan(length=0), returning the carry unchanged and empty stacked metrics."""
    from lshm_tpu.train.step import admm_loop

    def body(c, _):
        return c + 1, {"loss": c * 1.0}

    for unroll in (True, False):
        carry, metrics = admm_loop(body, jnp.zeros(()), 0, unroll)
        assert float(carry) == 0.0
        assert metrics["loss"].shape == (0,)


@pytest.mark.slow
def test_bf16_full_sharded_step_matches_single_device():
    """The mixed-precision headline mode (compute_dtype=bfloat16_full: the step casts
    the batch to bf16 internally) under the GSPMD data-parallel path must match the
    single-device bf16_full step — the cast composes with batch sharding because it
    is elementwise and the loss reductions accumulate in f32 on each shard before
    the (sum/numel) combine."""
    from lshm_tpu.train.parallel import shard_batch, train_step_sharded

    cfg = tiny_config(compute_dtype="bfloat16_full")
    model = CascadedAE(cfg=cfg.model)
    x, uv = make_batch(jax.random.PRNGKey(11))
    state, tx = init_train_state(model, cfg, jax.random.PRNGKey(12), x, uv)
    mesh = make_mesh((8,), ("data",))
    raw = make_train_step(model, tx, cfg, num_groups=2, donate=False, jit=False)

    single = make_train_step(model, tx, cfg, num_groups=2, donate=False)
    s1, m1 = single(state, x, uv, LossWeights())
    assert np.all(np.isfinite(np.asarray(m1["loss"])))

    sharded = train_step_sharded(raw, mesh, donate=False)
    xs, uvs = shard_batch(mesh, x, uv)
    s2, m2 = sharded(replicate_state(mesh, state), xs, uvs,
                     replicate_state(mesh, LossWeights()))
    # bf16 forward + f32 accumulation: shard-order effects are bounded by bf16 eps
    np.testing.assert_allclose(
        np.asarray(m1["loss"]), np.asarray(m2["loss"]), rtol=5e-3
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
