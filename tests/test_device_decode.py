"""On-device decode parity: device_decode_patchify must reproduce the host batch
reader exactly (decode per src/lofar_tools.py:112-141; clamp + per-baseline
z-norm per the eval reader :333-338), and the device-decode eval path must give
the same distance matrix as the host-decode oracle path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lshm_tpu.data.device_decode import device_decode_patchify
from lshm_tpu.data.h5io import (
    read_baselines_patches_batch,
    read_baselines_raw_batch,
)


@pytest.mark.parametrize("num_channels", [4, 8])
def test_device_decode_matches_host_reader(synth_h5, num_channels):
    ids = [0, 2, 5]
    vis, scales, uv = read_baselines_raw_batch(synth_h5, "0", ids, uvdist=True)
    got = np.asarray(device_decode_patchify(
        jnp.asarray(vis), jnp.asarray(scales), num_channels=num_channels))
    px, py, want, uv_want = read_baselines_patches_batch(
        synth_h5, "0", ids, patch_size=128, num_channels=num_channels,
        uvdist=True, use_native=False)
    assert got.shape == want.shape == (len(ids) * px * py, 128, 128, num_channels)
    # f32 reduction-order noise in the z-norm mean/std (device tree-reduce vs
    # numpy pairwise) perturbs normalized values by ~3e-5 relative; a real decode
    # bug (wrong channel order / scale row) would be O(1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.repeat(uv, px * py, axis=0), uv_want, rtol=1e-6)


def test_device_decode_ragged_pads(tmp_path):
    """Ragged SAP (ntime/nfreq below the patch size) exercises the device pad path."""
    from lshm_tpu.data.synthetic import write_synthetic_h5

    h5 = write_synthetic_h5(str(tmp_path / "L000009.MS_extract.h5"),
                            nstations=3, ntime=100, nfreq=150, seed=1)
    ids = [0, 1]
    vis, scales = read_baselines_raw_batch(h5, "0", ids)
    got = np.asarray(device_decode_patchify(jnp.asarray(vis), jnp.asarray(scales)))
    _, _, want = read_baselines_patches_batch(h5, "0", ids, use_native=False)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_global_norm_matches_training_reader(synth_h5):
    """per_baseline_norm=False reproduces the training sampler's global z-norm."""
    from lshm_tpu.data.h5io import read_baseline_channels
    from lshm_tpu.data.patches import patchify

    ids = [1, 3]
    vis, scales = read_baselines_raw_batch(synth_h5, "0", ids)
    got = np.asarray(device_decode_patchify(
        jnp.asarray(vis), jnp.asarray(scales), clamp=1e3,
        per_baseline_norm=False))
    x = read_baseline_channels(synth_h5, "0", ids, 4, patch_size=128)
    want, _ = patchify(x, 128)
    want = np.clip(want, -1e3, 1e3)
    want = (want - want.mean()) / (want.std() or 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_distance_matrix_device_decode_matches_host(synth_h5):
    """baseline_distance_matrix(device_decode=True) == the host-decode oracle,
    including the padded tail chunk, pipelined and serial."""
    from lshm_tpu.config import ModelConfig
    from lshm_tpu.eval.clustering import baseline_distance_matrix
    from lshm_tpu.models import CascadedAE

    cfg = ModelConfig(latent_dim=16, latent_dim_1d=8, num_clusters=3, rica=True)
    model = CascadedAE(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 128, 128, 4)), jnp.zeros((1, 2)))
    # bpb=4 over 10 baselines -> a padded tail chunk of 2
    ref_X, ref_L = baseline_distance_matrix(
        model, params, synth_h5, "0", baselines_per_batch=4,
        decode_lookahead=0, device_decode=False)
    for lookahead in (0, 2):
        X, L = baseline_distance_matrix(
            model, params, synth_h5, "0", baselines_per_batch=4,
            decode_lookahead=lookahead, device_decode=True)
        np.testing.assert_allclose(X, ref_X, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(L, ref_L, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- training path

def _sampler(synth_h5, seed, augment, **kw):
    import os

    from lshm_tpu.config import DataConfig
    from lshm_tpu.data.sampler import MinibatchSampler

    cfg = DataConfig(data_dir=os.path.dirname(synth_h5), batch_size=3,
                     augment=augment)
    return MinibatchSampler([synth_h5], ["0"], cfg, seed=seed,
                            use_native=False, **kw)


@pytest.mark.parametrize("augment", [False, True])
def test_sample_raw_stream_and_decode_parity(synth_h5, augment):
    """sample_raw() + device_decode_train == sample(), and both consume the rng
    stream identically (checkpoint/exact-resume interchangeability)."""
    from lshm_tpu.data.device_decode import device_decode_train

    s_host = _sampler(synth_h5, seed=11, augment=augment)
    s_raw = _sampler(synth_h5, seed=11, augment=augment)
    for _ in range(3):   # several draws so stream drift would accumulate
        mb = s_host.sample()
        raw = s_raw.sample_raw()
        assert (s_host.rng.bit_generator.state == s_raw.rng.bit_generator.state)
        got = np.asarray(device_decode_train(
            jnp.asarray(raw.vis), jnp.asarray(raw.scales),
            jnp.asarray(raw.flip_flags), num_channels=4, patch_size=128,
            clamp=1e3, normalize=True, augment=augment))
        assert got.shape == mb.x.shape
        np.testing.assert_allclose(got, mb.x, rtol=2e-4, atol=2e-5)
        ppb = raw.patchx * raw.patchy * (2 if augment else 1)
        np.testing.assert_allclose(np.repeat(raw.uv, ppb, axis=0), mb.uv,
                                   rtol=1e-6)


def test_sample_raw_rejects_custom_augment(synth_h5):
    def my_augment(rng, patches):
        rng.random()
        return patches

    s = _sampler(synth_h5, seed=0, augment=True, augment_fn=my_augment)
    assert not s.supports_device_decode
    with pytest.raises(RuntimeError, match="custom augment_fn"):
        s.sample_raw()


def test_device_decode_prefetcher_matches_host_sampler(synth_h5):
    from lshm_tpu.data.sampler import DeviceDecodePrefetcher

    s_host = _sampler(synth_h5, seed=3, augment=True)
    s_raw = _sampler(synth_h5, seed=3, augment=True)
    with DeviceDecodePrefetcher(s_raw, size=1) as pre:
        for _ in range(2):
            want = s_host.sample()
            got = next(pre)
            np.testing.assert_allclose(np.asarray(got.x), want.x,
                                       rtol=2e-4, atol=2e-5)
            np.testing.assert_allclose(np.asarray(got.uv), want.uv, rtol=1e-6)
            assert (got.patchx, got.patchy) == (want.patchx, want.patchy)


def test_trainer_device_decode_smoke(synth_h5):
    """Trainer runs end-to-end with data.device_decode=True (CPU: auto would be
    off, the explicit flag forces the raw path) and matches the host-decode
    run's first losses to decode-noise tolerance."""
    import os
    from dataclasses import replace

    from lshm_tpu.config import preset
    from lshm_tpu.train.trainer import Trainer

    losses = {}
    for dd in (False, True):
        cfg = preset("full_khm")
        cfg = replace(
            cfg,
            data=replace(cfg.data, data_dir=os.path.dirname(synth_h5),
                         batch_size=2, device_decode=dd, augment=True),
            model=replace(cfg.model, latent_dim=8, latent_dim_1d=4,
                          num_clusters=2),
            train=replace(cfg.train, num_epochs=1, iters_per_epoch=2,
                          admm_iters=1, seed=0, log_every=1),
        )
        t = Trainer(cfg)
        summary = t.run()
        losses[dd] = summary["loss"]
    np.testing.assert_allclose(losses[True], losses[False], rtol=5e-3)


def test_trainer_device_decode_requires_prefetch(synth_h5):
    import os
    from dataclasses import replace

    from lshm_tpu.config import preset
    from lshm_tpu.train.trainer import Trainer

    cfg = preset("full_khm")
    cfg = replace(
        cfg,
        data=replace(cfg.data, data_dir=os.path.dirname(synth_h5), batch_size=2,
                     device_decode=True, prefetch=0),
        train=replace(cfg.train, num_epochs=1, iters_per_epoch=1, admm_iters=1),
    )
    with pytest.raises(ValueError, match="prefetch"):
        Trainer(cfg).run()
