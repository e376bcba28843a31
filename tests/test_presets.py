"""Preset plumbing smoke tests: each BASELINE.json pipeline configuration trains one
tiny step end-to-end through the Trainer."""

import dataclasses

import numpy as np
import pytest

from lshm_tpu.config import LBFGSConfig, ModelConfig, OptimConfig, TrainConfig, preset
from lshm_tpu.train.trainer import Trainer
from lshm_tpu.utils.metrics import MetricLogger


def _shrink(cfg):
    return cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=2),
        model=dataclasses.replace(
            cfg.model, latent_dim=16, latent_dim_1d=8, num_clusters=3,
            latent_dim_fourier=8,
        ),
        optim=dataclasses.replace(
            cfg.optim, lbfgs=LBFGSConfig(max_iter=1, history_size=2)
        ),
        train=TrainConfig(num_epochs=1, iters_per_epoch=1, admm_iters=1,
                          checkpoint_dir=""),
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "name", ["ae2d_adam", "fourier_cascade", "full_khm", "full_khm_bf16", "full_khm_lbfgs"]
)
def test_preset_trains(name, synth_h5):
    from lshm_tpu.data import MinibatchSampler

    cfg = _shrink(preset(name))
    logger = MetricLogger(echo=False)
    t = Trainer(cfg, logger)
    sampler = MinibatchSampler([synth_h5], ["0"], cfg.data, seed=0)
    summary = t.run(sampler)
    assert np.isfinite(summary["loss"]), (name, summary)


def test_metric_logger_plot(tmp_path):
    logger = MetricLogger(echo=False)
    logger.log_step(0, 0, {"loss": np.array([1.0]), "loss0": np.array([0.5])})
    logger.log_step(0, 1, {"loss": np.array([0.8]), "loss0": np.array([0.4])})
    out = tmp_path / "errors.png"
    logger.plot(str(out))
    assert out.exists()


def test_prefetch_iterator_closes(synth_h5):
    from lshm_tpu.config import DataConfig
    from lshm_tpu.data import MinibatchSampler
    from lshm_tpu.data.sampler import PrefetchIterator

    cfg = DataConfig(batch_size=2, patch_size=128)
    sampler = MinibatchSampler([synth_h5], ["0"], cfg, seed=0)
    with PrefetchIterator(sampler, size=2) as it:
        mb = next(it)
        assert mb.x.shape[0] == 8
    assert not it._thread.is_alive()   # producer exited, no leak