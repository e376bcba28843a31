"""Trainer orchestration tests: tiny end-to-end runs on the synthetic fixture, ramp with
optimizer switching, checkpoint save/load round trip, CLI smoke."""

import numpy as np
import jax
import pytest

from lshm_tpu.config import (
    Config, DataConfig, LBFGSConfig, LossConfig, ModelConfig, OptimConfig,
    RampStage, TrainConfig,
)
from lshm_tpu.train.trainer import Trainer
from lshm_tpu.utils.metrics import MetricLogger


def tiny_cfg(ckpt_dir="", **train_kw):
    return Config(
        data=DataConfig(batch_size=2, patch_size=128, num_channels=4),
        model=ModelConfig(latent_dim=16, latent_dim_1d=8, num_clusters=4, rica=True),
        loss=LossConfig(),
        optim=OptimConfig(optimizer="adam", adam_lr=1e-3,
                          lbfgs=LBFGSConfig(max_iter=2, history_size=3)),
        train=TrainConfig(
            num_epochs=1, iters_per_epoch=2, admm_iters=2,
            checkpoint_dir=ckpt_dir, **train_kw,
        ),
    )


def make_sampler(synth_h5, cfg):
    from lshm_tpu.data import MinibatchSampler

    return MinibatchSampler([synth_h5], ["0"], cfg.data, seed=0)


def test_trainer_runs_and_logs(synth_h5):
    cfg = tiny_cfg()
    logger = MetricLogger(echo=False)
    t = Trainer(cfg, logger)
    summary = t.run(make_sampler(synth_h5, cfg))
    assert len(logger.history) == 2
    assert np.isfinite(summary["loss"])


@pytest.mark.slow
def test_trainer_ramp_optimizer_switch(synth_h5):
    cfg = tiny_cfg()
    cfg = cfg.replace(train=TrainConfig(
        num_epochs=2, iters_per_epoch=1, admm_iters=1, checkpoint_dir="",
        ramp=(RampStage(epochs=1, alpha=0.001, optimizer="adam"),
              RampStage(epochs=1, alpha=0.01, optimizer="lbfgs")),
    ))
    logger = MetricLogger(echo=False)
    t = Trainer(cfg, logger)
    t.run(make_sampler(synth_h5, cfg))
    assert t._opt_kind[0] == "lbfgs"       # switched
    assert len(logger.history) == 2
    assert all(np.isfinite(h["loss"]) for h in logger.history)


def test_trainer_group_schedule(synth_h5):
    cfg = tiny_cfg()
    cfg = cfg.replace(
        optim=OptimConfig(optimizer="adam", adam_lr=1e-3,
                          group_schedule=("ae2d", "khm")),
        train=TrainConfig(num_epochs=2, iters_per_epoch=1, admm_iters=1,
                          checkpoint_dir=""),
    )
    t = Trainer(cfg, MetricLogger(echo=False))
    t.run(make_sampler(synth_h5, cfg))
    assert t._opt_kind == ("adam", "khm")


def test_checkpoint_roundtrip(synth_h5, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    cfg = tiny_cfg(ckpt_dir=ckpt)
    t = Trainer(cfg, MetricLogger(echo=False))
    t.run(make_sampler(synth_h5, cfg))
    params_before = t.params

    t2 = Trainer(cfg, MetricLogger(echo=False))
    t2.load(ckpt)
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_synth_and_train(tmp_path, capsys):
    from lshm_tpu.cli import main

    data_dir = str(tmp_path / "data")
    import os

    os.makedirs(data_dir)
    main(["synth", "--out", data_dir, "--nstations", "4", "--ntime", "192",
          "--nfreq", "192"])
    out = capsys.readouterr().out
    assert "wrote" in out

    main([
        "train", "--data-dir", data_dir, "--preset", "full_khm", "--quiet",
        "--set", "train.num_epochs=1", "--set", "train.iters_per_epoch=1",
        "--set", "train.admm_iters=1", "--set", "data.batch_size=2",
        "--set", "model.latent_dim=16", "--set", "model.latent_dim_1d=8",
        "--set", "model.num_clusters=3",
        "--set", f"train.checkpoint_dir={tmp_path}/cli_ckpt",
    ])
    out = capsys.readouterr().out
    assert "done:" in out


@pytest.mark.slow
def test_exact_resume_roundtrip(synth_h5, tmp_path):
    """Full-state checkpoint: optimizer state + epoch restored; resumed run matches an
    uninterrupted run exactly (per-epoch reseeded sampler)."""
    ckpt = str(tmp_path / "ck")
    base = tiny_cfg(ckpt_dir=ckpt)
    from lshm_tpu.config import TrainConfig
    import dataclasses

    # uninterrupted: 2 epochs
    cfg2 = base.replace(train=dataclasses.replace(base.train, num_epochs=2,
                                                  checkpoint_dir=""))
    t_full = Trainer(cfg2, MetricLogger(echo=False))
    t_full.run(make_sampler(synth_h5, cfg2))

    # interrupted: 1 epoch + save, then resume for epoch 2
    cfg1 = base.replace(train=dataclasses.replace(base.train, num_epochs=1,
                                                  checkpoint_dir=ckpt))
    t_a = Trainer(cfg1, MetricLogger(echo=False))
    t_a.run(make_sampler(synth_h5, cfg1))

    t_b = Trainer(cfg2.replace(train=dataclasses.replace(cfg2.train, checkpoint_dir="")),
                  MetricLogger(echo=False))
    t_b.load(ckpt)
    assert t_b._resume_epoch == 1
    t_b.run(make_sampler(synth_h5, cfg2))

    for a, b in zip(jax.tree.leaves(t_full.params), jax.tree.leaves(t_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_profile_dir_trace_capture(synth_h5, tmp_path):
    """--profile-dir captures a jax.profiler trace of the first epoch."""
    import os

    prof = str(tmp_path / "trace")
    cfg = tiny_cfg()
    t = Trainer(cfg, MetricLogger(echo=False), profile_dir=prof)
    t.run(make_sampler(synth_h5, cfg))
    hits = [os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs]
    assert hits, f"no trace files written under {prof}"


def test_config_override_empty_tuple():
    from lshm_tpu.config import _apply_overrides, preset

    cfg = _apply_overrides(preset("full_khm"), ["optim.group_schedule=ae2d,ae1d,khm"])
    assert cfg.optim.group_schedule == ("ae2d", "ae1d", "khm")
    cfg = _apply_overrides(preset("full_khm"), ["model.harmonic_scales=0.1,0.2"])
    assert cfg.model.harmonic_scales == (0.1, 0.2)


@pytest.mark.slow
def test_trainer_prefetch_path(synth_h5):
    import dataclasses

    cfg = tiny_cfg()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, prefetch=2))
    t = Trainer(cfg, MetricLogger(echo=False))
    summary = t.run(make_sampler(synth_h5, cfg))
    assert np.isfinite(summary["loss"])


def test_trainer_mesh_sharded_run(synth_h5):
    """cfg.train.mesh_shape > 1 routes every step through the GSPMD sharded path
    (VERDICT round 2 item 2): runs on the 8 virtual CPU devices and stays finite."""
    import dataclasses

    cfg = tiny_cfg()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, mesh_shape=(8,)))
    t = Trainer(cfg, MetricLogger(echo=False))
    assert t.mesh is not None and t.mesh.shape["data"] == 8
    summary = t.run(make_sampler(synth_h5, cfg))
    assert np.isfinite(summary["loss"])
    # the live state is replicated over the mesh
    leaf = jax.tree.leaves(t._state.params)[0]
    assert len(leaf.sharding.device_set) == 8


@pytest.mark.slow
def test_trainer_mesh_matches_unsharded(synth_h5):
    """Same seed + same data stream: the mesh Trainer's params match the unsharded
    Trainer's params (GSPMD reduction reorders float sums -> tolerance, not bitwise)."""
    import dataclasses

    cfg = tiny_cfg()
    t1 = Trainer(cfg, MetricLogger(echo=False))
    t1.run(make_sampler(synth_h5, cfg))

    cfg8 = cfg.replace(train=dataclasses.replace(cfg.train, mesh_shape=(-1,)))
    t2 = Trainer(cfg8, MetricLogger(echo=False))
    assert t2.mesh is not None
    t2.run(make_sampler(synth_h5, cfg8))

    for a, b in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_trainer_mesh_checkpoint_roundtrip(synth_h5, tmp_path):
    import dataclasses

    ckpt = str(tmp_path / "ck")
    cfg = tiny_cfg(ckpt_dir=ckpt)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, mesh_shape=(8,),
                                                checkpoint_dir=ckpt))
    t = Trainer(cfg, MetricLogger(echo=False))
    t.run(make_sampler(synth_h5, cfg))

    t2 = Trainer(cfg, MetricLogger(echo=False))
    t2.load(ckpt)
    for a, b in zip(jax.tree.leaves(t.params), jax.tree.leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_cli_train_mesh(tmp_path, capsys):
    """`cli train --set train.mesh_shape=8` trains on 8 virtual devices
    (VERDICT round 2 item 2 done-criterion)."""
    import os

    from lshm_tpu.cli import main

    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    main(["synth", "--out", data_dir, "--nstations", "4", "--ntime", "192",
          "--nfreq", "192"])
    capsys.readouterr()
    main([
        "train", "--data-dir", data_dir, "--preset", "full_khm",
        "--set", "train.mesh_shape=8",
        "--set", "train.num_epochs=1", "--set", "train.iters_per_epoch=1",
        "--set", "train.admm_iters=1", "--set", "data.batch_size=2",
        "--set", "model.latent_dim=16", "--set", "model.latent_dim_1d=8",
        "--set", "model.num_clusters=3",
        "--set", f"train.checkpoint_dir={tmp_path}/cli_ckpt",
    ])
    out = capsys.readouterr().out
    assert "mesh: {'data': 8}" in out
    assert "done:" in out


@pytest.mark.slow
def test_mid_epoch_exact_resume(synth_h5, tmp_path):
    """Kill/resume mid-epoch reproduces the uninterrupted run exactly (VERDICT round 2
    item 8): save_every_iters checkpoints (epoch, iter); resume repositions the sampler
    stream via skip() and finishes the epoch on the same minibatches."""
    import dataclasses

    ckpt = str(tmp_path / "ck")
    base = tiny_cfg()
    cfg = base.replace(train=dataclasses.replace(
        base.train, num_epochs=1, iters_per_epoch=4, admm_iters=2,
        checkpoint_dir=ckpt, save_every_iters=2,
    ))

    # uninterrupted run
    cfg_full = cfg.replace(train=dataclasses.replace(cfg.train, checkpoint_dir="",
                                                     save_every_iters=0))
    t_full = Trainer(cfg_full, MetricLogger(echo=False))
    t_full.run(make_sampler(synth_h5, cfg_full))

    # interrupted: run with mid-epoch saves, then resume from the iter-2 checkpoint
    t_a = Trainer(cfg, MetricLogger(echo=False))
    t_a.run(make_sampler(synth_h5, cfg))

    from lshm_tpu.utils.checkpoint import latest_step

    # resume specifically from the MID-epoch checkpoint (step 2), not the final one
    t_b = Trainer(cfg_full, MetricLogger(echo=False))
    t_b.load(ckpt, step=2)
    assert t_b._resume_epoch == 0 and t_b._resume_iter == 2
    logger_b = t_b.logger
    t_b.run(make_sampler(synth_h5, cfg_full))

    for a, b in zip(jax.tree.leaves(t_full.params), jax.tree.leaves(t_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resume_iter_not_stale_across_loads(synth_h5, tmp_path):
    """A later load of an epoch-boundary checkpoint clears any mid-epoch position left
    by an earlier load, and run() consumes the resume position (a second run starts
    fresh) — regression for the stale _resume_iter bug."""
    import dataclasses

    ckpt = str(tmp_path / "ck")
    base = tiny_cfg()
    cfg = base.replace(train=dataclasses.replace(
        base.train, num_epochs=1, iters_per_epoch=4, admm_iters=1,
        checkpoint_dir=ckpt, save_every_iters=2,
    ))
    t = Trainer(cfg, MetricLogger(echo=False))
    t.run(make_sampler(synth_h5, cfg))

    t2 = Trainer(cfg, MetricLogger(echo=False))
    t2.load(ckpt, step=2)                   # mid-epoch checkpoint
    assert t2._resume_iter == 2
    t2.load(ckpt, step=4)                   # epoch-boundary checkpoint (iter=0)
    assert t2._resume_iter == 0, "stale mid-epoch iter must be cleared"

    t2.load(ckpt, step=2)
    t2.run(make_sampler(synth_h5, cfg.replace(train=dataclasses.replace(
        cfg.train, checkpoint_dir="", save_every_iters=0))))
    assert t2._resume_epoch == 0 and t2._resume_iter == 0, \
        "run() must consume the resume position"


def test_sampler_skip_matches_sampling(synth_h5):
    """skip(n) advances the rng stream exactly as n sample() calls would."""
    from lshm_tpu.config import DataConfig
    from lshm_tpu.data import MinibatchSampler

    for augment in (False, True):
        cfg = DataConfig(batch_size=2, patch_size=128, augment=augment)
        a = MinibatchSampler([synth_h5], ["0"], cfg, seed=3)
        b = MinibatchSampler([synth_h5], ["0"], cfg, seed=3)
        for _ in range(3):
            a.sample()
        b.skip(3)
        np.testing.assert_array_equal(a.sample().x, b.sample().x)


def test_sampler_rejects_data_dependent_augment(synth_h5):
    """An augment fn whose rng consumption depends on the data would silently desync
    skip()-based exact resume; the sampler must refuse it loudly (VERDICT r3 #6)."""
    import pytest

    from lshm_tpu.config import DataConfig
    from lshm_tpu.data import MinibatchSampler

    def evil(rng, patches):
        if patches.max() > 0:          # draws only for non-zero data
            if rng.random() < 0.5:
                patches = patches[:, ::-1]
        return np.ascontiguousarray(patches)

    cfg = DataConfig(batch_size=2, patch_size=128, augment=True)
    with pytest.raises(RuntimeError, match="data-dependent"):
        MinibatchSampler([synth_h5], ["0"], cfg, seed=3, augment_fn=evil)

    def shape_shifting(rng, patches):   # consumption varies with group size
        for _ in range(patches.shape[0]):
            rng.random()
        return patches

    cfg_small = DataConfig(batch_size=2, patch_size=128, augment=True)
    with pytest.raises(RuntimeError, match="data-dependent"):
        # construction probes use two fixed same-shape datasets, so this passes the
        # probe — but the first real sample() (different group size) must raise
        s = MinibatchSampler([synth_h5], ["0"], cfg_small, seed=3,
                             augment_fn=shape_shifting)
        s.sample()

    # the default flip augmentation keeps working and resumes exactly
    ok = MinibatchSampler([synth_h5], ["0"], cfg, seed=5)
    ok.sample()
    ok.skip(2)


def test_mesh_autospan_preserves_axis_count(monkeypatch):
    """Multi-process default config (mesh_shape product 1) auto-spans all devices on
    the data axis while keeping one mesh dim per configured axis name — regression
    for make_mesh((-1,), ('data','model')) raising on reshape."""
    import dataclasses

    cfg = tiny_cfg()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, mesh_shape=(1, 1), mesh_axes=("data", "model")))
    t = Trainer(cfg, MetricLogger(echo=False))
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    mesh = t.mesh
    assert mesh is not None
    assert dict(mesh.shape) == {"data": len(jax.devices()), "model": 1}


def test_make_mesh_rejects_shape_axes_mismatch():
    from lshm_tpu.train.parallel import make_mesh

    with pytest.raises(ValueError, match="axis name"):
        make_mesh((-1,), ("data", "model"))


@pytest.mark.slow
def test_lbfgs_mode_exact_resume(synth_h5, tmp_path):
    """A checkpoint taken in L-BFGS mode restores the FULL optimizer state (curvature
    history, running batch statistics, func_evals) and the resumed run reproduces the
    uninterrupted trajectory exactly — the reference never checkpoints optimizer state
    at all (reference: src/kharmonic_lofar.py:210-222)."""
    import dataclasses

    ckpt = str(tmp_path / "ck")
    base = tiny_cfg()
    two_epochs = dataclasses.replace(
        base.train, num_epochs=2, iters_per_epoch=1, admm_iters=1, checkpoint_dir="")
    cfg_full = base.replace(
        optim=dataclasses.replace(base.optim, optimizer="lbfgs"),
        train=two_epochs,
    )
    t_full = Trainer(cfg_full, MetricLogger(echo=False))
    t_full.run(make_sampler(synth_h5, cfg_full))

    # interrupted: 1 epoch + save, then a fresh Trainer resumes epoch 2
    cfg_a = cfg_full.replace(train=dataclasses.replace(
        two_epochs, num_epochs=1, checkpoint_dir=ckpt))
    t_a = Trainer(cfg_a, MetricLogger(echo=False))
    t_a.run(make_sampler(synth_h5, cfg_a))

    t_b = Trainer(cfg_full, MetricLogger(echo=False))
    t_b.load(ckpt)
    assert t_b._opt_kind[0] == "lbfgs"
    # optimizer state restored, not re-initialized: cumulative closure evals carry over
    assert int(np.asarray(t_b._state.opt_state.func_evals)) == int(
        np.asarray(t_a._state.opt_state.func_evals))
    t_b.run(make_sampler(synth_h5, cfg_full))

    for a, b in zip(jax.tree.leaves(t_full.params), jax.tree.leaves(t_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
