"""Fused Pallas TPU kernel for the K-harmonic-means clustering loss.

A VMEM-resident pass computes pairwise distances (MXU matmul), the p-th-power harmonic
mean, and the scalar loss; the custom VJP computes both parameter gradients with two more
MXU matmuls — no [N, K] intermediates ever round-trip through HBM.  The reference computes
this loss with a Python double loop over batch x clusters (reference:
src/lofar_models.py:199-209); the XLA fallback (lshm_tpu.losses.khm_loss) is already a
single fused expression, so this kernel is *benchmark-gated*: ``khm_loss_fused`` uses it
only on TPU backends (interpret mode elsewhere keeps tests hermetic).

The patch axis is tiled: the grid walks [N] in VMEM-sized blocks of ``_BLOCK_N`` rows
(scalar loss and the [K, D] centroid gradient accumulate across sequential grid steps;
TPU grids are sequential so += on a same-block output is the standard reduction idiom),
so the kernel serves arbitrarily large patch batches — the tail block is masked.

Math (p even, the shipped Khp=4 case):
    d2[i,k] = ||x_i - m_k||^2,  t = d2^(p/2) + eps,  e_i = sum_k 1/t_ik
    L = sum_i (K / (e_i + eps)) / (N * K * D)
    dL/dx_i =  sum_k c_ik (x_i - m_k),   dL/dm_k = -sum_i c_ik (x_i - m_k)
    c_ik = p * d2^(p/2 - 1) / ((N * D) * (e_i + eps)^2 * t_ik^2)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-capable installs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

EPS = 1e-9
_BLOCK_N = 1024          # rows per grid step: [1024, D=256] f32 = 1 MiB of VMEM per input


def khm_loss_pallas_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def _block_rows(n: int) -> int:
    """Tile size over the patch axis: whole-array when small (one grid step), else
    _BLOCK_N; rounded up to the f32 sublane multiple of 8."""
    bn = min(n, _BLOCK_N)
    return (bn + 7) // 8 * 8


def _ipow(x, n: int):
    """x**n by static repeated multiplication (integer `**` lowering stalls the Mosaic
    compiler on this toolchain; n is a Python int so this unrolls at trace time)."""
    acc = x
    for _ in range(n - 1):
        acc = acc * x
    return acc


def _masked_rows(x_ref, n_total: int):
    """Load a block, zeroing rows that lie beyond the true array end (tail padding)."""
    X = x_ref[:]
    bn = X.shape[0]
    row = pl.program_id(0) * bn + jax.lax.broadcasted_iota(jnp.int32, (bn, 1), 0)
    valid = row < n_total
    return jnp.where(valid, X, 0.0), valid


def _fwd_kernel(p: int, n_total: int, x_ref, m_ref, loss_ref, e_ref):
    X, valid = _masked_rows(x_ref, n_total)
    M = m_ref[:]
    _, D = X.shape
    K = M.shape[0]
    xx = jnp.sum(X * X, axis=-1, keepdims=True)
    mm = jnp.sum(M * M, axis=-1)[None, :]
    xm = jnp.dot(X, M.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(xx + mm - 2.0 * xm, 0.0)
    t = _ipow(d2, p // 2) + EPS
    e = jnp.sum(1.0 / t, axis=-1, keepdims=True)            # [BN, 1]
    e_ref[:] = e
    part = jnp.sum(jnp.where(valid, K / (e + EPS), 0.0)) / (n_total * K * D)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        loss_ref[0, 0] = 0.0

    loss_ref[0, 0] += part


def _bwd_kernel(p: int, n_total: int, x_ref, m_ref, e_ref, g_ref, dx_ref, dm_ref):
    X, valid = _masked_rows(x_ref, n_total)
    M = m_ref[:]
    e = e_ref[:]                                             # [BN, 1]
    g = g_ref[0, 0]
    _, D = X.shape
    xx = jnp.sum(X * X, axis=-1, keepdims=True)
    mm = jnp.sum(M * M, axis=-1)[None, :]
    xm = jnp.dot(X, M.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(xx + mm - 2.0 * xm, 0.0)
    t = _ipow(d2, p // 2) + EPS
    pow_term = _ipow(d2, p // 2 - 1) if p > 2 else jnp.ones_like(d2)
    c = (p * pow_term) / ((n_total * D) * (e + EPS) ** 2 * t * t)  # [BN, K]
    c = jnp.where(valid, c * g, 0.0)
    crow = jnp.sum(c, axis=-1, keepdims=True)                # [BN, 1]
    ccol = jnp.sum(c, axis=0)[:, None]                       # [K, 1]
    dx_ref[:] = crow * X - jnp.dot(c, M, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dm_ref[:] = jnp.zeros_like(dm_ref)

    dm_ref[:] += ccol * M - jnp.dot(c.T, X, preferred_element_type=jnp.float32)


def _spaces(vmem, smem, interpret: bool):
    """(VMEM, SMEM) memory-space kwargs, or empty dicts in interpret mode."""
    if _HAS_PLTPU and not interpret:
        return {"memory_space": vmem}, {"memory_space": smem}
    return {}, {}


def _call_fwd(X, M, p: int, interpret: bool):
    N, D = X.shape
    K = M.shape[0]
    bn = _block_rows(N)
    grid = (pl.cdiv(N, bn),)
    vm, sm = _spaces(pltpu.VMEM if _HAS_PLTPU else None,
                     pltpu.SMEM if _HAS_PLTPU else None, interpret)
    loss, e = pl.pallas_call(
        functools.partial(_fwd_kernel, p, N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, D), lambda i: (i, 0), **vm),
            pl.BlockSpec((K, D), lambda i: (0, 0), **vm),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda i: (0, 0), **sm),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), **vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ),
        interpret=interpret,
    )(X, M)
    return loss[0, 0], e


def _call_bwd(X, M, e, g, p: int, interpret: bool):
    N, D = X.shape
    K = M.shape[0]
    bn = _block_rows(N)
    grid = (pl.cdiv(N, bn),)
    vm, sm = _spaces(pltpu.VMEM if _HAS_PLTPU else None,
                     pltpu.SMEM if _HAS_PLTPU else None, interpret)
    dx, dm = pl.pallas_call(
        functools.partial(_bwd_kernel, p, N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, D), lambda i: (i, 0), **vm),
            pl.BlockSpec((K, D), lambda i: (0, 0), **vm),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), **vm),
            pl.BlockSpec((1, 1), lambda i: (0, 0), **sm),
        ],
        out_specs=(
            pl.BlockSpec((bn, D), lambda i: (i, 0), **vm),
            pl.BlockSpec((K, D), lambda i: (0, 0), **vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, D), jnp.float32),
            jax.ShapeDtypeStruct((K, D), jnp.float32),
        ),
        interpret=interpret,
    )(X, M, e, g.reshape(1, 1))
    return dx, dm


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _khm_loss_pallas(X, M, p: int, interpret: bool):
    loss, _ = _call_fwd(X, M, p, interpret)
    return loss


def _khm_fwd(X, M, p: int, interpret: bool):
    loss, e = _call_fwd(X, M, p, interpret)
    return loss, (X, M, e)


def _khm_bwd(p: int, interpret: bool, res, g):
    X, M, e = res
    dx, dm = _call_bwd(X, M, e, g, p, interpret)
    return dx, dm


_khm_loss_pallas.defvjp(_khm_fwd, _khm_bwd)


def khm_loss_fused(X: jnp.ndarray, M: jnp.ndarray, p: int = 4,
                   force: str | None = None) -> jnp.ndarray:
    """KHM loss with automatic backend choice: Pallas on TPU, XLA elsewhere.

    ``force``: "pallas" | "interpret" | "xla" for testing.  Odd p falls back to XLA
    (the shipped configuration uses p=4; reference: src/kharmonic_lofar.py:40).

    Inputs are upcast to f32 first (same convention as lshm_tpu.losses._f32): under
    the bfloat16_full data path the latents arrive bf16, and the Pallas custom VJP
    emits f32 cotangents — the cast keeps the custom_vjp primal f32 so autodiff
    routes the dtype conversion through the cast instead of tripping the aval
    check."""
    from lshm_tpu.losses import _f32, khm_loss

    X, M = _f32(X), _f32(M)
    if force == "xla" or p % 2 == 1:
        return khm_loss(X, M, p)
    if force == "pallas":
        return _khm_loss_pallas(X, M, p, False)
    if force == "interpret":
        return _khm_loss_pallas(X, M, p, True)
    if khm_loss_pallas_available():
        return _khm_loss_pallas(X, M, p, False)
    return khm_loss(X, M, p)
