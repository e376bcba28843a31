"""Native fused decode+patchify: bit-level parity with the numpy reference path, and
the sampler's native fast path producing identical minibatches."""

import numpy as np
import pytest

from lshm_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")


def _numpy_reference(vis, scales, pols, patch, clamp, normalize):
    """The pure-numpy pipeline (decode -> pad -> patchify -> clamp -> z-norm)."""
    from lshm_tpu.data.patches import patchify

    nb, ntime, nfreq, npol, _ = vis.shape
    C = 2 * len(pols)
    x = np.zeros((nb, max(ntime, patch), max(nfreq, patch), C), np.float32)
    for i in range(nb):
        for ci, p in enumerate(pols):
            s = scales[i, :, p][None, :]
            x[i, :ntime, :nfreq, 2 * ci] = vis[i, :, :, p, 0].astype(np.float32) * s
            x[i, :ntime, :nfreq, 2 * ci + 1] = vis[i, :, :, p, 1].astype(np.float32) * s
    patches, dims = patchify(x, patch)
    patches = np.clip(patches, -clamp, clamp)
    if normalize:
        std = patches.std()
        patches = (patches - patches.mean()) / (std if std > 0 else 1.0)
    return patches, dims


@pytest.mark.parametrize("pols", [(0, 3), (0, 1, 2, 3)])
@pytest.mark.parametrize("tf", [(192, 192), (100, 256), (90, 90)])
def test_native_matches_numpy(pols, tf):
    rng = np.random.default_rng(0)
    ntime, nfreq = tf
    vis = rng.integers(-127, 128, size=(3, ntime, nfreq, 4, 2), dtype=np.int8)
    scales = rng.uniform(0.01, 2.0, size=(3, nfreq, 4)).astype(np.float32)
    got, gdims = native.decode_patchify(vis, scales, pols, 128, 1e3, normalize=True)
    want, wdims = _numpy_reference(vis, scales, pols, 128, 1e3, normalize=True)
    assert gdims == wdims
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_native_clamp():
    rng = np.random.default_rng(1)
    vis = np.full((1, 128, 128, 4, 2), 100, np.int8)
    scales = np.full((1, 128, 4), 50.0, np.float32)  # values 5000 > clamp 1000
    got, _ = native.decode_patchify(vis, scales, (0, 3), 128, 1e3, normalize=False)
    assert got.max() == 1e3


def test_batch_reader_native_equals_numpy(synth_h5):
    """The eval-path batch reader's native fast path (per-baseline native calls, so
    the z-norm stats stay per-baseline) must match the numpy oracle path."""
    from lshm_tpu.data.h5io import read_baselines_patches_batch

    ids = [0, 2, 5]
    px_n, py_n, pn, uvn = read_baselines_patches_batch(
        synth_h5, "0", ids, uvdist=True, use_native=True)
    px_o, py_o, po, uvo = read_baselines_patches_batch(
        synth_h5, "0", ids, uvdist=True, use_native=False)
    assert (px_n, py_n) == (px_o, py_o)
    np.testing.assert_allclose(pn, po, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(uvn, uvo)


def test_sampler_native_equals_numpy(synth_h5):
    from lshm_tpu.config import DataConfig
    from lshm_tpu.data import MinibatchSampler

    cfg = DataConfig(batch_size=3, patch_size=128)
    a = MinibatchSampler([synth_h5], ["0"], cfg, seed=5, use_native=True).sample()
    b = MinibatchSampler([synth_h5], ["0"], cfg, seed=5, use_native=False).sample()
    np.testing.assert_allclose(a.x, b.x, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(a.uv, b.uv)
