"""Data-layer tests: scanner, metadata, decode, uv math, patching, sampler."""

import math
import os

import h5py
import numpy as np
import pytest

from lshm_tpu.config import DataConfig
from lshm_tpu.data import (
    Minibatch,
    MinibatchSampler,
    compute_uv,
    patch_grid_shape,
    patchify,
    read_baseline_channels,
    read_baseline_flat,
    read_baseline_patches,
    read_metadata,
    scan_files,
)


def test_scan_files_finds_valid(synth_h5_dir, synth_h5):
    files, saps = scan_files(synth_h5_dir)
    assert files == [synth_h5]
    assert saps == ["0"]


def test_scan_files_rejects_small(tmp_path):
    from lshm_tpu.data.synthetic import write_synthetic_h5

    # too few freq channels -> fails the nfreq>=90 gate
    write_synthetic_h5(str(tmp_path / "L1.MS_extract.h5"), ntime=192, nfreq=50)
    files, saps = scan_files(str(tmp_path))
    assert files == []


def test_metadata(synth_h5):
    shape = read_metadata(synth_h5, "0")
    assert shape == (10, 192, 192, 4, 2)  # 4 stations incl. autocorr -> 10 pairs
    baselines, shape2 = read_metadata(synth_h5, "0", give_baselines=True)
    assert shape2 == shape
    assert baselines.shape == (10, 2)
    # autocorrelations present
    assert any(b[0] == b[1] for b in baselines)


def test_decode_matches_manual(synth_h5):
    x = read_baseline_channels(synth_h5, "0", [1, 3], num_channels=4)
    assert x.shape == (2, 192, 192, 4)
    with h5py.File(synth_h5, "r") as f:
        g = f["measurement"]["saps"]["0"]["visibilities"]
        h = f["measurement"]["saps"]["0"]["visibility_scale_factors"]
        # channel 0/1 = re/im of pol 0; channel 2/3 = re/im of pol 3
        want_re0 = g[1, :, :, 0, 0].astype(np.float32) * h[1, :, 0][None, :]
        want_im3 = g[1, :, :, 3, 1].astype(np.float32) * h[1, :, 3][None, :]
    np.testing.assert_allclose(x[0, :, :, 0], want_re0, rtol=1e-6)
    np.testing.assert_allclose(x[0, :, :, 3], want_im3, rtol=1e-6)


def test_decode_8ch(synth_h5):
    x = read_baseline_channels(synth_h5, "0", [0], num_channels=8)
    assert x.shape == (1, 192, 192, 8)


def test_uv_math(synth_h5):
    uv = compute_uv(synth_h5, "0", [0, 1])
    with h5py.File(synth_h5, "r") as f:
        hms = f["measurement"]["info"]["start_time"][0].decode().split()[1].split(":")
        hours = float(hms[0]) + float(hms[1]) / 60 + float(hms[2]) / 3600
        theta = hours / 24 * 2 * math.pi
        frq = f["measurement"]["saps"]["0"]["central_frequencies"][...]
        inv_lambda = frq[len(frq) // 2] / 2.99792458e8
        xyz = f["measurement"]["saps"]["0"]["antenna_locations"]["XYZ"][...]
        bl = f["measurement"]["saps"]["0"]["baselines"][...]
    # baseline 0 is an autocorrelation -> uv = 0
    assert bl[0][0] == bl[0][1]
    np.testing.assert_allclose(uv[0], [0.0, 0.0], atol=1e-9)
    dx = xyz[bl[1][0]][0] - xyz[bl[1][1]][0]
    dy = xyz[bl[1][0]][1] - xyz[bl[1][1]][1]
    want_u = (dx * math.cos(theta) + dy * math.sin(theta)) * inv_lambda
    want_v = (-dx * math.sin(theta) + dy * math.cos(theta)) * inv_lambda
    np.testing.assert_allclose(uv[1], [want_u, want_v], rtol=1e-5)


def test_patch_grid_shape():
    # 192x192 with 128 patches, stride 64 -> 2x2
    assert patch_grid_shape(192, 192, 128) == (2, 2)
    assert patch_grid_shape(128, 128, 128) == (1, 1)
    assert patch_grid_shape(256, 192, 128) == (3, 2)


def test_patchify_values_and_order():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 192, 192, 3)).astype(np.float32)
    patches, (px, py) = patchify(x, 128)
    assert (px, py) == (2, 2)
    assert patches.shape == (2 * 4, 128, 128, 3)
    # baseline-major: rows 0..3 belong to baseline 0, row-major over the patch grid
    np.testing.assert_array_equal(patches[0], x[0, 0:128, 0:128])
    np.testing.assert_array_equal(patches[1], x[0, 0:128, 64:192])
    np.testing.assert_array_equal(patches[2], x[0, 64:192, 0:128])
    np.testing.assert_array_equal(patches[3], x[0, 64:192, 64:192])
    np.testing.assert_array_equal(patches[4], x[1, 0:128, 0:128])


def test_patchify_jax_matches_numpy():
    import jax.numpy as jnp

    from lshm_tpu.data.patches import patchify_jax

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 192, 192, 4)).astype(np.float32)
    want, dims = patchify(x, 128)
    got, dims2 = patchify_jax(jnp.asarray(x), 128)
    assert dims == dims2
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_read_baseline_patches_normalized(synth_h5):
    px, py, patches, uv = read_baseline_patches(
        synth_h5, "0", 1, patch_size=128, num_channels=4, uvdist=True
    )
    assert (px, py) == (2, 2)
    assert patches.shape == (4, 128, 128, 4)
    assert uv.shape == (4, 2)
    # eval reader always z-normalizes
    assert abs(patches.mean()) < 1e-5
    assert abs(patches.std() - 1.0) < 1e-4
    # uv constant within the baseline
    np.testing.assert_array_equal(uv[0], uv[3])


def test_read_baseline_patches_give_baseline(synth_h5):
    px, py, patches, bl = read_baseline_patches(
        synth_h5, "0", 2, patch_size=128, give_baseline=True
    )
    assert len(bl) == 2


def test_read_baseline_flat(synth_h5):
    x = read_baseline_flat(synth_h5, "0", 0, num_channels=4)
    assert x.shape == (192, 192, 4)
    assert np.abs(x).max() <= 1e6


def test_sampler_shapes_and_grouping(synth_h5):
    cfg = DataConfig(batch_size=3, patch_size=128, num_channels=4)
    s = MinibatchSampler([synth_h5], ["0"], cfg, seed=0)
    mb = s.sample()
    assert isinstance(mb, Minibatch)
    assert mb.x.shape == (3 * 4, 128, 128, 4)
    assert mb.uv.shape == (12, 2)
    assert mb.patches_per_baseline == 4
    # global z-normalization
    assert abs(mb.x.mean()) < 1e-5
    assert abs(mb.x.std() - 1.0) < 1e-3
    # uv grouped baseline-major: constant within each group of 4
    for b in range(3):
        grp = mb.uv[b * 4 : (b + 1) * 4]
        assert np.all(grp == grp[0])


def test_sampler_augment_doubles(synth_h5):
    cfg = DataConfig(batch_size=2, patch_size=128, augment=True)
    s = MinibatchSampler([synth_h5], ["0"], cfg, seed=0)
    mb = s.sample()
    assert mb.x.shape[0] == 2 * 2 * 4
    assert mb.patches_per_baseline == 8
    assert mb.uv.shape[0] == 16


def test_sampler_determinism(synth_h5):
    cfg = DataConfig(batch_size=2, patch_size=128)
    a = MinibatchSampler([synth_h5], ["0"], cfg, seed=42).sample()
    b = MinibatchSampler([synth_h5], ["0"], cfg, seed=42).sample()
    np.testing.assert_array_equal(a.x, b.x)
    np.testing.assert_array_equal(a.uv, b.uv)


def test_batch_reader_matches_per_baseline(synth_h5):
    """read_baselines_patches_batch == per-baseline read_baseline_patches (patches, uv,
    station pairs), with ONE h5 open per chunk instead of two per baseline."""
    import h5py

    from lshm_tpu.data.h5io import (
        read_baseline_patches,
        read_baselines_patches_batch,
        read_metadata,
    )

    ids = [0, 2, 3]
    opens = []
    orig = h5py.File.__init__

    def counting(self, *a, **kw):
        target = a[0] if a else kw.get("name")
        if isinstance(target, (str, bytes, os.PathLike)):   # real file opens only
            opens.append(target)
        return orig(self, *a, **kw)

    h5py.File.__init__ = counting
    try:
        px, py, patches, uv, pairs = read_baselines_patches_batch(
            synth_h5, "0", ids, patch_size=128, uvdist=True, give_baselines=True
        )
    finally:
        h5py.File.__init__ = orig
    assert len(opens) == 1, f"batch reader opened the file {len(opens)} times"

    ppb = px * py
    for i, b in enumerate(ids):
        px1, py1, p1, uv1, bl1 = read_baseline_patches(
            synth_h5, "0", b, patch_size=128, uvdist=True, give_baseline=True
        )
        assert (px1, py1) == (px, py)
        np.testing.assert_allclose(patches[i * ppb : (i + 1) * ppb], p1, atol=1e-6)
        np.testing.assert_allclose(uv[i * ppb : (i + 1) * ppb], uv1, atol=1e-6)
        assert tuple(pairs[i]) == tuple(bl1)


def test_batch_reader_rejects_empty_ids(synth_h5):
    """Empty baseline_ids raises a clear ValueError on both the native and numpy
    paths (ADVICE r4: the native fast path previously hit UnboundLocalError)."""
    import pytest

    from lshm_tpu.data.h5io import read_baselines_patches_batch

    for use_native in (False, None):
        with pytest.raises(ValueError, match="non-empty"):
            read_baselines_patches_batch(synth_h5, "0", [], use_native=use_native)
