"""Fused Pallas TPU kernel for the K-harmonic-means clustering loss.

One VMEM-resident pass computes pairwise distances (MXU matmul), the p-th-power harmonic
mean, and the scalar loss; the custom VJP computes both parameter gradients with two more
MXU matmuls — no [N, K] intermediates ever round-trip through HBM.  The reference computes
this loss with a Python double loop over batch x clusters (reference:
src/lofar_models.py:199-209); the XLA fallback (lshm_tpu.losses.khm_loss) is already a
single fused expression, so this kernel is *benchmark-gated*: ``khm_loss_fused`` uses it
only on TPU backends (interpret mode elsewhere keeps tests hermetic).

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


def khm_loss_pallas_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def _ipow(x, n: int):
    """x**n by static repeated multiplication (integer `**` lowering stalls the Mosaic
    compiler on this toolchain; n is a Python int so this unrolls at trace time)."""
    acc = x
    for _ in range(n - 1):
        acc = acc * x
    return acc


def _fwd_kernel(p: int, x_ref, m_ref, loss_ref, e_ref):
    X = x_ref[:]
    M = m_ref[:]
    N, D = X.shape
    K = M.shape[0]
    xx = jnp.sum(X * X, axis=-1, keepdims=True)
    mm = jnp.sum(M * M, axis=-1)[None, :]
    xm = jnp.dot(X, M.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(xx + mm - 2.0 * xm, 0.0)
    t = _ipow(d2, p // 2) + EPS
    e = jnp.sum(1.0 / t, axis=-1, keepdims=True)            # [N, 1]
    e_ref[:] = e
    loss_ref[0, 0] = jnp.sum(K / (e + EPS)) / (N * K * D)


def _bwd_kernel(p: int, x_ref, m_ref, e_ref, g_ref, dx_ref, dm_ref):
    X = x_ref[:]
    M = m_ref[:]
    e = e_ref[:]                                             # [N, 1]
    g = g_ref[0, 0]
    N, D = X.shape
    xx = jnp.sum(X * X, axis=-1, keepdims=True)
    mm = jnp.sum(M * M, axis=-1)[None, :]
    xm = jnp.dot(X, M.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(xx + mm - 2.0 * xm, 0.0)
    t = _ipow(d2, p // 2) + EPS
    pow_term = _ipow(d2, p // 2 - 1) if p > 2 else jnp.ones_like(d2)
    c = (p * pow_term) / ((N * D) * (e + EPS) ** 2 * t * t)  # [N, K]
    c = c * g
    crow = jnp.sum(c, axis=-1, keepdims=True)                # [N, 1]
    ccol = jnp.sum(c, axis=0)[:, None]                       # [K, 1]
    dx_ref[:] = crow * X - jnp.dot(c, M, preferred_element_type=jnp.float32)
    dm_ref[:] = ccol * M - jnp.dot(c.T, X, preferred_element_type=jnp.float32)


def _call_fwd(X, M, p: int, interpret: bool):
    N, D = X.shape
    kernel = functools.partial(_fwd_kernel, p)
    if _HAS_PLTPU and not interpret:
        specs = dict(
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        )
    else:
        specs = {}
    loss, e = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ),
        interpret=interpret,
        **specs,
    )(X, M)
    return loss[0, 0], e


def _call_bwd(X, M, e, g, p: int, interpret: bool):
    N, D = X.shape
    K = M.shape[0]
    kernel = functools.partial(_bwd_kernel, p)
    if _HAS_PLTPU and not interpret:
        specs = dict(
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
        )
    else:
        specs = {}
    dx, dm = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, D), jnp.float32),
            jax.ShapeDtypeStruct((K, D), jnp.float32),
        ),
        interpret=interpret,
        **specs,
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
    (the shipped configuration uses p=4; reference: src/kharmonic_lofar.py:40)."""
    from lshm_tpu.losses import khm_loss

    if force == "xla" or p % 2 == 1:
        return khm_loss(X, M, p)
    if force == "pallas":
        return _khm_loss_pallas(X, M, p, False)
    if force == "interpret":
        return _khm_loss_pallas(X, M, p, True)
    if khm_loss_pallas_available():
        return _khm_loss_pallas(X, M, p, False)
    return khm_loss(X, M, p)
