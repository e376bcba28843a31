"""Data-layer hardening against real-schema variance (VERDICT r4 item 7).

Real LOFAR extracts vary: SAP shapes are not patch multiples, datasets go
missing, files get truncated mid-copy, and npol can differ.  The reference
tolerates bad files only at the SCANNER (bare ``except: skip``,
reference: src/lofar_tools.py:457-458) and crashes loudly in the readers; these
tests pin the same contract here — scan_files never admits an unusable SAP,
and the readers raise (rather than silently mis-decode) on schema violations.
"""

import os

import h5py
import numpy as np
import pytest

from lshm_tpu.data.h5io import (
    read_baseline_patches,
    read_baselines_patches_batch,
    scan_files,
)
from lshm_tpu.data.synthetic import write_synthetic_h5


def _h5(tmp_path, name="L000001.MS_extract.h5", **kw):
    return write_synthetic_h5(str(tmp_path / name), **kw)


# --------------------------------------------------------------- ragged SAP shapes

@pytest.mark.parametrize("ntime,nfreq", [(150, 200), (192, 130), (97, 91)])
def test_ragged_sap_pads_to_patch_grid(tmp_path, ntime, nfreq):
    """ntime/nfreq not multiples of the patch stride exercise the zero-pad path
    (reference pads up to patch_size: src/lofar_tools.py:157-173).  The patch grid
    must match the shared patch_grid law and the pad region must be exactly the
    z-normed image of zero (per-baseline stats), on BOTH reader paths."""
    h5 = _h5(tmp_path, nstations=3, ntime=ntime, nfreq=nfreq)
    ps, stride = 128, 64
    want_px = (max(ntime, ps) - ps) // stride + 1
    want_py = (max(nfreq, ps) - ps) // stride + 1

    for use_native in (False, None):
        px, py, patches, uv = read_baselines_patches_batch(
            h5, "0", [0, 1], patch_size=ps, uvdist=True, use_native=use_native)
        assert (px, py) == (want_px, want_py), (use_native, px, py)
        assert patches.shape == (2 * px * py, ps, ps, 4)
        assert np.all(np.isfinite(patches))
        if ntime < ps:
            # the pad rows beyond ntime are constant (z-norm image of zero):
            # all-equal along the padded region of the LAST patch row
            tail = patches[px * py - 1, ntime - (px - 1) * stride:, :, :]
            assert np.allclose(tail, tail.reshape(-1, 4)[0], atol=1e-6)


def test_ragged_sap_trains_through_sampler(tmp_path):
    """The sampler (training path) must accept a ragged SAP end to end."""
    from lshm_tpu.config import DataConfig
    from lshm_tpu.data import MinibatchSampler

    h5 = _h5(tmp_path, nstations=3, ntime=150, nfreq=200)
    cfg = DataConfig(data_dir=str(tmp_path), batch_size=2)
    mb = MinibatchSampler([h5], ["0"], cfg, seed=0).sample()
    px = (150 - 128) // 64 + 1
    py = (200 - 128) // 64 + 1
    assert mb.x.shape == (2 * px * py, 128, 128, 4)
    assert np.all(np.isfinite(mb.x))


# ------------------------------------------------------------- missing datasets

def test_missing_scale_factors_scanner_admits_reader_raises(tmp_path):
    """The validity gate checks only the visibilities shape (reference
    :453), so a SAP missing visibility_scale_factors still scans — and the
    readers must then raise KeyError loudly, like the reference's h[...] access
    (src/lofar_tools.py:83), never silently decode unscaled int8."""
    h5 = _h5(tmp_path)
    with h5py.File(h5, "r+") as f:
        del f["measurement"]["saps"]["0"]["visibility_scale_factors"]
    files, saps = scan_files(str(tmp_path))
    assert (files, saps) == ([h5], ["0"])
    with pytest.raises(KeyError):
        read_baseline_patches(h5, "0", 0)
    with pytest.raises(KeyError):
        read_baselines_patches_batch(h5, "0", [0, 1])


def test_missing_visibilities_sap_skipped(tmp_path):
    """A SAP with no visibilities dataset is skipped; other SAPs survive."""
    h5 = _h5(tmp_path, saps=("0", "1"))
    with h5py.File(h5, "r+") as f:
        del f["measurement"]["saps"]["0"]["visibilities"]
    files, saps = scan_files(str(tmp_path))
    assert (files, saps) == ([h5], ["1"])


def test_missing_antenna_locations_only_breaks_uv(tmp_path):
    """uv needs antenna_locations/XYZ; without it the plain read still works and
    only the uvdist=True path raises."""
    h5 = _h5(tmp_path)
    with h5py.File(h5, "r+") as f:
        del f["measurement"]["saps"]["0"]["antenna_locations"]
    px, py, patches = read_baselines_patches_batch(h5, "0", [0])
    assert patches.shape[0] == px * py
    with pytest.raises(KeyError):
        read_baselines_patches_batch(h5, "0", [0], uvdist=True)


# ----------------------------------------------------------------- corrupt files

def test_truncated_file_skipped_by_scanner(tmp_path):
    """A file truncated mid-copy (invalid HDF5 tail / unreadable) is skipped by
    the scanner without aborting the scan (reference's except: pass tolerance,
    src/lofar_tools.py:457-458); intact files in the same directory survive."""
    good = _h5(tmp_path, name="L000001.MS_extract.h5")
    bad = str(tmp_path / "L000002.MS_extract.h5")
    with open(good, "rb") as f:
        raw = f.read()
    with open(bad, "wb") as f:
        f.write(raw[: len(raw) // 3])
    files, saps = scan_files(str(tmp_path))
    assert (files, saps) == ([good], ["0"])


def test_garbage_file_skipped_by_scanner(tmp_path):
    good = _h5(tmp_path, name="L000001.MS_extract.h5")
    with open(tmp_path / "L000003.MS_extract.h5", "wb") as f:
        f.write(b"not an hdf5 file at all")
    files, saps = scan_files(str(tmp_path))
    assert (files, saps) == ([good], ["0"])


# --------------------------------------------------------------- wrong-shape SAPs

def test_npol2_sap_rejected(tmp_path):
    """npol != 4 fails the validity gate (reference :453) even when everything
    else is in range."""
    h5 = _h5(tmp_path)
    with h5py.File(h5, "r+") as f:
        g = f["measurement"]["saps"]["0"]
        vis = g["visibilities"][...][:, :, :, :2, :]
        del g["visibilities"]
        g.create_dataset("visibilities", data=vis)
    assert scan_files(str(tmp_path)) == ([], [])


def test_single_baseline_sap_rejected(tmp_path):
    """nbase > 1 is required (reference :453)."""
    h5 = _h5(tmp_path)
    with h5py.File(h5, "r+") as f:
        g = f["measurement"]["saps"]["0"]
        vis = g["visibilities"][...][:1]
        del g["visibilities"]
        g.create_dataset("visibilities", data=vis)
    assert scan_files(str(tmp_path)) == ([], [])


def test_wrong_rank_visibilities_rejected(tmp_path):
    """A visibilities dataset of the wrong rank (unpackable shape) hits the
    per-SAP except and is skipped, not crashed on."""
    h5 = _h5(tmp_path)
    with h5py.File(h5, "r+") as f:
        g = f["measurement"]["saps"]["0"]
        del g["visibilities"]
        g.create_dataset("visibilities", data=np.zeros((4, 100, 100), np.int8))
    assert scan_files(str(tmp_path)) == ([], [])
