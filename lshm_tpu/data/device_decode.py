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


def _decode_channels_dev(vis: jnp.ndarray, scales: jnp.ndarray,
                         num_channels: int) -> jnp.ndarray:
    """int8 ``vis`` [B, T, F, npol, 2] x f32 ``scales`` [B, F, npol] -> f32
    [B, T, F, C] real channels (re, im per selected polarization; reference
    decode: src/lofar_tools.py:112-141)."""
    pols = _POLS_4CH if num_channels == 4 else _POLS_8CH
    v = vis.astype(jnp.float32)                            # int8 -> f32 on device
    chans = []
    for p in pols:
        s = scales[:, None, :, p]                          # [B, 1, F]
        chans.append(v[:, :, :, p, 0] * s)
        chans.append(v[:, :, :, p, 1] * s)
    return jnp.stack(chans, axis=-1)                       # [B, T, F, C]


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
    b, t, f, _, _ = vis.shape
    x = _decode_channels_dev(vis, scales, num_channels)    # [B, T, F, C]
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


@partial(jax.jit, static_argnames=("num_channels", "patch_size", "clamp",
                                   "normalize", "augment"))
def device_decode_train(
    vis: jnp.ndarray,
    scales: jnp.ndarray,
    flip_flags: jnp.ndarray,
    num_channels: int = 4,
    patch_size: int = 128,
    clamp: float = 1e3,
    normalize: bool = True,
    augment: bool = False,
) -> jnp.ndarray:
    """The TRAINING sampler's decode, on device: int8 ``vis`` [B, T, F, npol, 2]
    x f32 ``scales`` [B, F, npol] -> float32 patches, baseline-major.

    Exactly ``MinibatchSampler.sample()``'s math (lshm_tpu/data/sampler.py;
    reference: src/lofar_tools.py:51-211): decode channels, zero-pad up to the
    patch size, 50%-overlap patchify, clamp +-``clamp``, GLOBAL z-norm over the
    whole minibatch (the training semantics, reference :190-193), then — when
    ``augment`` — double the batch with per-baseline time/freq flips interleaved
    (original group, then flipped group, per baseline), driven by the host rng's
    ``flip_flags`` [B, 2] bool so the data stream is bit-compatible with the
    host path's ``default_augment``.

    Shipping raw int8 instead of decoded f32 patches moves ~8-22x fewer bytes
    across the host->device link (44x with augmentation, which doubles decoded
    bytes but is free here) — the link is the measured end-to-end bottleneck on
    tunneled attachments (benchmarks/recipe_run_report.json, README round 5).
    Returns [B * px * py * (2 if augment else 1), ps, ps, C].
    """
    b, t, f, _, _ = vis.shape
    x = _decode_channels_dev(vis, scales, num_channels)
    pt, pf = max(t, patch_size), max(f, patch_size)
    if (pt, pf) != (t, f):
        x = jnp.pad(x, ((0, 0), (0, pt - t), (0, pf - f), (0, 0)))
    patches, (px, py) = patchify_jax(x, patch_size)
    patches = jnp.clip(patches, -clamp, clamp)
    if normalize:
        mean, std = patches.mean(), patches.std()
        patches = (patches - mean) / jnp.where(std > 0, std, 1.0)
    if augment:
        grouped = patches.reshape(b, px * py, patch_size, patch_size, -1)
        flipped = jnp.where(flip_flags[:, 0, None, None, None, None],
                            grouped[:, :, ::-1, :, :], grouped)
        flipped = jnp.where(flip_flags[:, 1, None, None, None, None],
                            flipped[:, :, :, ::-1, :], flipped)
        patches = jnp.stack([grouped, flipped], axis=1).reshape(
            b * 2 * px * py, patch_size, patch_size, grouped.shape[-1]
        )
    return patches
