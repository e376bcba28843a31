"""Host input-pipeline benchmark: native C++ fused decode+patchify vs the numpy path.

The reference decodes int8 visibilities x scale factors through several numpy/torch
passes inside ``get_data_minibatch`` (reference: src/lofar_tools.py:112-193); here the
native loader (lshm_tpu/native/patchio.cpp) fuses decode, scale multiply, patchify,
clamp and the normalization statistics into one OpenMP pass.  This script measures both
paths on identical in-memory buffers (no h5py, isolating decode cost) and writes
``native_loader_report.json``.

Run: python benchmarks/native_loader_bench.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _numpy_path(vis, scales, num_channels, patch, clamp):
    from lshm_tpu.data.h5io import _decode_channels
    from lshm_tpu.data.patches import patchify

    x = _decode_channels(vis, scales, list(range(len(vis))), num_channels)
    patches, grid = patchify(x, patch)
    patches = np.clip(patches, -clamp, clamp)
    std = patches.std()
    return (patches - patches.mean()) / (std if std > 0 else 1.0), grid


def main():
    import sys

    sys.path.insert(0, REPO)
    from lshm_tpu import native
    from lshm_tpu.data.h5io import _POLS_4CH

    rng = np.random.default_rng(0)
    nb, ntime, nfreq, npol = 12, 192, 192, 4
    vis = rng.integers(-127, 127, size=(nb, ntime, nfreq, npol, 2), dtype=np.int8)
    scales = rng.uniform(0.5, 2.0, size=(nb, nfreq, npol)).astype(np.float32)
    patch, clamp = 128, 1e3

    report = {"shape": [nb, ntime, nfreq, npol], "patch": patch,
              "native_available": native.available()}

    reps = 10
    t_np = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out_np, grid = _numpy_path(vis, scales, 4, patch, clamp)
        t_np.append(time.perf_counter() - t0)
    report["numpy_ms"] = min(t_np) * 1e3

    if native.available():
        t_nat = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out_nat, grid_n = native.decode_patchify(
                vis, scales, _POLS_4CH, patch, clamp, normalize=True
            )
            t_nat.append(time.perf_counter() - t0)
        report["native_ms"] = min(t_nat) * 1e3
        report["native_speedup"] = report["numpy_ms"] / report["native_ms"]
        assert grid_n == grid
        np.testing.assert_allclose(out_nat, out_np, rtol=1e-4, atol=1e-5)
        report["outputs_match"] = True

    n_patches = nb * grid[0] * grid[1]
    report["patches"] = n_patches
    report["numpy_patches_per_sec"] = n_patches / (report["numpy_ms"] / 1e3)
    if "native_ms" in report:
        report["native_patches_per_sec"] = n_patches / (report["native_ms"] / 1e3)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "native_loader_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
