"""On-device decode + patchify: ship int8, not float32 patches.

The eval pipeline's true bottleneck on a tunneled TPU attachment is neither the
host decode nor the device forward — it is the host->device transfer of decoded
float32 patch batches (measured 2026-08-20: a 52 MB chunk costs ~1.2 s through
the relay, 16x the decode time; benchmarks/eval_pipeline_bench.py).  Overlapping
50% patchify amplifies bytes 4-6x and f32 quadruples int8, so shipping decoded
patches moves ~22x more bytes than the raw data contains.

This module moves the whole decode onto the device: the host ships the raw int8
visibilities + float32 scale factors exactly as stored in the H5 (reference
schema: src/lofar_tools.py:76-83), and one jitted program does scale-multiply,
channel selection, zero-pad, overlapping patch extraction, clamp and
z-normalization in HBM (819 GB/s), fused with whatever consumes the patches.
Math is identical to the host readers (parity-tested in
tests/test_device_decode.py): decode per src/lofar_tools.py:112-141, clamp +
per-baseline z-norm per the eval reader :333-338.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lshm_tpu.data.patches import patchify_jax

_POLS_4CH = (0, 3)
_POLS_8CH = (0, 1, 2, 3)


@partial(jax.jit, static_argnames=("num_channels", "patch_size", "clamp",
                                   "per_baseline_norm"))
def device_decode_patchify(
    vis: jnp.ndarray,
    scales: jnp.ndarray,
    num_channels: int = 4,
    patch_size: int = 128,
    clamp: float = 1e6,
    per_baseline_norm: bool = True,
) -> jnp.ndarray:
    """int8 ``vis`` [B, T, F, npol, 2] x f32 ``scales`` [B, F, npol] ->
    z-normalized float32 patches [B * px * py, ps, ps, C], baseline-major.

    Exactly the eval batch reader's math (lshm_tpu/data/h5io.py::
    read_baselines_patches_batch, numpy path): channels (re, im) of each selected
    polarization, zero-pad up to the patch size, 50%-overlap patchify, clamp
    +-``clamp``, then z-norm — per baseline over its own patches when
    ``per_baseline_norm`` (the eval semantics), else globally (the training
    sampler semantics, reference: src/lofar_tools.py:190-193)."""
    pols = _POLS_4CH if num_channels == 4 else _POLS_8CH
    b, t, f, _, _ = vis.shape
    v = vis.astype(jnp.float32)                            # int8 -> f32 on device
    chans = []
    for p in pols:
        s = scales[:, None, :, p]                          # [B, 1, F]
        chans.append(v[:, :, :, p, 0] * s)
        chans.append(v[:, :, :, p, 1] * s)
    x = jnp.stack(chans, axis=-1)                          # [B, T, F, C]
    pt, pf = max(t, patch_size), max(f, patch_size)
    if (pt, pf) != (t, f):
        x = jnp.pad(x, ((0, 0), (0, pt - t), (0, pf - f), (0, 0)))
    patches, (px, py) = patchify_jax(x, patch_size)
    patches = jnp.clip(patches, -clamp, clamp)
    if per_baseline_norm:
        grouped = patches.reshape(b, px * py, *patches.shape[1:])
        mean = grouped.mean(axis=(1, 2, 3, 4), keepdims=True)
        std = grouped.std(axis=(1, 2, 3, 4), keepdims=True)
        grouped = (grouped - mean) / jnp.where(std > 0, std, 1.0)
        patches = grouped.reshape(patches.shape)
    else:
        mean, std = patches.mean(), patches.std()
        patches = (patches - mean) / jnp.where(std > 0, std, 1.0)
    return patches
