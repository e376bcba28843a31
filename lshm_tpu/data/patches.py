"""Overlapping-patch extraction (host numpy + jittable JAX variants).

Spectrograms are cut into ``patch_size x patch_size`` tiles with 50% overlap
(stride = patch_size // 2; reference: src/lofar_tools.py:157-173).  Patch batches are
emitted *baseline-major*: all patches of baseline ``b`` are contiguous, row-major over the
(patchx, patchy) grid.  This fixes the reference's patch-major/baseline-major ordering
mismatch (see lshm_tpu/data/h5io.py module docstring).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def patch_grid_shape(T: int, F: int, patch_size: int) -> tuple[int, int]:
    """Number of overlapping patches along (time, freq) for stride = patch_size//2."""
    stride = patch_size // 2
    return (T - patch_size) // stride + 1, (F - patch_size) // stride + 1


def patchify(x: np.ndarray, patch_size: int) -> tuple[np.ndarray, tuple[int, int]]:
    """Host-side unfold: [n, T, F, C] -> ([n * px * py, ps, ps, C], (px, py)).

    Zero-copy view via stride tricks followed by a single gather-into-contiguous copy.
    """
    n, T, F, C = x.shape
    stride = patch_size // 2
    px, py = patch_grid_shape(T, F, patch_size)
    sN, sT, sF, sC = x.strides
    view = np.lib.stride_tricks.as_strided(
        x,
        shape=(n, px, py, patch_size, patch_size, C),
        strides=(sN, sT * stride, sF * stride, sT, sF, sC),
        writeable=False,
    )
    out = np.ascontiguousarray(view).reshape(n * px * py, patch_size, patch_size, C)
    return out, (px, py)


def patchify_jax(x: jnp.ndarray, patch_size: int) -> tuple[jnp.ndarray, tuple[int, int]]:
    """Jittable unfold: [n, T, F, C] -> ([n * px * py, ps, ps, C], (px, py)).

    (px, py) are static, so the patch grid unrolls into a stack of static slices —
    pure data movement, exact on every backend, and fusable under jit.
    """
    n, T, F, C = x.shape
    stride = patch_size // 2
    px, py = patch_grid_shape(T, F, patch_size)
    rows = []
    for i in range(px):
        for j in range(py):
            rows.append(
                lax.slice(
                    x,
                    (0, i * stride, j * stride, 0),
                    (n, i * stride + patch_size, j * stride + patch_size, C),
                )
            )
    patches = jnp.stack(rows, axis=1)            # [n, px*py, ps, ps, C]
    return patches.reshape(n * px * py, patch_size, patch_size, C), (px, py)


def unpatchify_mean(
    patches: jnp.ndarray, n: int, px: int, py: int, T: int, F: int
) -> jnp.ndarray:
    """Inverse of patchify by averaging overlaps: [n*px*py, ps, ps, C] -> [n, T, F, C]."""
    ps = patches.shape[1]
    stride = ps // 2
    C = patches.shape[-1]
    grid = patches.reshape(n, px, py, ps, ps, C)
    out = jnp.zeros((n, T, F, C), patches.dtype)
    cnt = jnp.zeros((n, T, F, 1), patches.dtype)
    for i in range(px):
        for j in range(py):
            out = out.at[:, i * stride : i * stride + ps, j * stride : j * stride + ps].add(
                grid[:, i, j]
            )
            cnt = cnt.at[:, i * stride : i * stride + ps, j * stride : j * stride + ps].add(1.0)
    return out / jnp.maximum(cnt, 1.0)
