"""Synthetic LOFAR ``MS_extract.h5`` fixture generator.

The reference repo ships no test data and no tests; the closest thing is the fringe
simulator in its demo script (reference: src/display_colors.py:27-51), which synthesizes a
plausible interferometer spectrogram from per-polarization gains, a source direction (l, m)
and a time-rotated, frequency-scaled uv track.  This module turns that physics into a
generator that writes a tiny schema-valid H5 file (schema documented in
lshm_tpu/data/h5io.py), satisfying the scanner's validity gate (nbase>1, nfreq>=90,
ntime>=90, npol==4, reim==2; reference: src/lofar_tools.py:453) so the whole pipeline is
hermetically testable on CPU.
"""

from __future__ import annotations

import os

import h5py
import numpy as np


def synth_fringe(
    rng: np.random.Generator,
    ntime: int,
    nfreq: int,
    uv_meters: np.ndarray,
    noise: float = 0.1,
) -> np.ndarray:
    """Synthesize one baseline's visibilities: float [ntime, nfreq, 4 pol, 2 reim].

    A point source at random (l, m) observed through a uv track that rotates with time
    and scales with frequency, with per-polarization complex gains plus noise.
    """
    t = np.linspace(0.0, 0.25, ntime) * 2.0 * np.pi                    # hour-angle sweep
    f = np.linspace(110e6, 180e6, nfreq) / 2.99792458e8                # 1 / lambda
    tt, ff = np.meshgrid(t, f, indexing="ij")
    u = (uv_meters[0] * np.cos(tt) + uv_meters[1] * np.sin(tt)) * ff
    v = (-uv_meters[0] * np.sin(tt) + uv_meters[1] * np.cos(tt)) * ff
    l, m = rng.uniform(-0.7, 0.7, size=2)
    phase = 2.0 * np.pi * (u * l + v * m)
    out = np.empty((ntime, nfreq, 4, 2), dtype=np.float64)
    for p in range(4):
        g_re, g_im = rng.uniform(0.3, 1.0), rng.uniform(-0.2, 0.2)
        out[:, :, p, 0] = g_re * np.cos(phase) - g_im * np.sin(phase)
        out[:, :, p, 1] = g_re * np.sin(phase) + g_im * np.cos(phase)
    out += rng.normal(0.0, noise, size=out.shape)
    return out


def write_synthetic_h5(
    path: str,
    nstations: int = 4,
    ntime: int = 192,
    nfreq: int = 192,
    saps: tuple[str, ...] = ("0",),
    include_autocorr: bool = True,
    seed: int = 0,
) -> str:
    """Write a schema-valid synthetic ``MS_extract.h5``; returns ``path``.

    Baselines are all station pairs (i <= j if ``include_autocorr`` else i < j).
    Visibilities are stored int8 with per-(baseline, freq, pol) float32 scale factors,
    exactly like real LOFAR extracts (reference: src/lofar_tools.py:76-83).
    """
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pairs = [
        (i, j)
        for i in range(nstations)
        for j in range(i if include_autocorr else i + 1, nstations)
    ]
    nbase = len(pairs)
    xyz = rng.uniform(-2000.0, 2000.0, size=(nstations, 3))

    with h5py.File(path, "w") as f:
        info = f.create_group("measurement/info")
        info.create_dataset(
            "start_time", data=np.array([b"2020-01-01 12:30:00"], dtype="S19")
        )
        for sap in saps:
            g = f.create_group(f"measurement/saps/{sap}")
            vis = np.empty((nbase, ntime, nfreq, 4, 2), dtype=np.int8)
            scales = np.empty((nbase, nfreq, 4), dtype=np.float32)
            for b, (s1, s2) in enumerate(pairs):
                uv_m = xyz[s1, :2] - xyz[s2, :2]
                if s1 == s2:  # autocorrelation: noise-dominated, flat
                    raw = np.abs(rng.normal(1.0, 0.2, size=(ntime, nfreq, 4, 2)))
                else:
                    raw = synth_fringe(rng, ntime, nfreq, uv_m)
                # int8 quantization with per-(freq, pol) scale, like the real extracts
                amax = np.abs(raw).max(axis=(0, 3)) + 1e-12      # [nfreq, 4]
                scale = (amax / 127.0).astype(np.float32)
                q = np.clip(np.round(raw / scale[None, :, :, None]), -127, 127)
                vis[b] = q.astype(np.int8)
                scales[b] = scale
            g.create_dataset("visibilities", data=vis)
            g.create_dataset("visibility_scale_factors", data=scales)
            g.create_dataset(
                "central_frequencies", data=np.linspace(110e6, 180e6, nfreq)
            )
            g.create_dataset("baselines", data=np.array(pairs, dtype=np.int64))
            g.create_dataset("antenna_locations/XYZ", data=xyz)
    return path
