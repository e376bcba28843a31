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
