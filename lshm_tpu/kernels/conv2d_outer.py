"""Fused Pallas TPU kernels for the 2D AE's full-resolution conv stages.

The flagship step is bound by its outermost conv stages (conv0/conv1 encoder,
tconv4/tconv5 decoder — reference ladder src/lofar_models.py:31-41): 4-12 channels on
a 128-lane MXU leave XLA's conv emitter at 5-12% utilization, and the surrounding
bias/ELU/cotangent glue materializes full-resolution intermediates in HBM.  These
kernels keep both outer encoder stages (conv + bias + ELU, twice) in one VMEM pass,
with a custom VJP whose backward kernel rematerializes the forward in VMEM and emits
weight/bias gradients — no full-resolution intermediate ever round-trips through HBM
between the stages.

Math: every k=4, s=2, p=1 conv is computed via the zero-tap-duplication space-to-depth
identity (see conv2d_s2_packed in lshm_tpu/models/autoencoders.py): a k=2, s=1 VALID
conv over the padded packed view [H/2+1, H/2+1, 4C].  In-kernel each such conv is ONE
full-grid matmul + four shifted-view adds:

    y   = grid[Hp*Wp, 4C] @ W[4C, 4F]          # all four taps at once, no im2col
    out = sum_pq y[p:p+H, q:q+H, pq*F:(pq+1)*F]

and each backward needs one shifted-copies buffer Z[i,j,(pq,f)] = dpre[i-p, j-q, f]
which serves BOTH gradients with one matmul each:

    dW = grid^T @ Z           dIn = Z @ W^T

Buffers keep the packed row dim (65/33) in the untiled outer dimension and pad the
packed column dim to a sublane multiple (72/40), so the matmul reshapes
[Hp, Wp, C] <-> [Hp*Wp, C] are relayout-free.

The input is pre-packed once in XLA (`s2d_pad`); under the unrolled ADMM loop that
transform is iteration-invariant and CSEs to once per minibatch.  The head's input
gradient is computed by a separate pallas_call so XLA can DCE it when the input is
training data (the primary AE; the Fourier-variant AE consumes residuals and keeps it).
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


def pallas_conv_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def _pad8(n: int) -> int:
    return (n + 7) // 8 * 8


def _compiler_params(interpret: bool):
    """Raised scoped-VMEM cap: thin-channel blocks pad lanes 4C->128, so the VMEM
    footprint is ~8x the logical bytes and the default 16 MiB scope overflows at
    useful G.  v5e has 128 MiB of VMEM."""
    if interpret or not _HAS_PLTPU:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=96 * 1024 * 1024)}


# ------------------------------------------------------------------ XLA-side packing

def s2d_pad(x: jnp.ndarray) -> jnp.ndarray:
    """[B, P, P, C] -> padded packed [B, P/2+1, pad8(P/2+1), 4C].

    packed channel (a, b, c): xp[i, j] = xpad[2i + a, 2j + b], xpad = pad(x, 1).
    The packed column dim is zero-padded to a sublane multiple so the kernels'
    [Hp, Wp, C] <-> [Hp*Wp, C] reshapes are relayout-free.
    """
    n, h, w, c = x.shape
    hp = h // 2 + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(n, hp, 2, hp, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(n, hp, hp, 4 * c)
    return jnp.pad(xp, ((0, 0), (0, 0), (0, _pad8(hp) - hp), (0, 0)))


def pack_w(w4: jnp.ndarray) -> jnp.ndarray:
    """HWIO [4, 4, C, F] -> [4C, 4F]: rows = packed channel (a, b, c), columns
    tap-major (p, q, f): wp[(a,b,c), (p,q,f)] = w4[2p + a, 2q + b, c, f]."""
    c, f = w4.shape[2], w4.shape[3]
    w = w4.reshape(2, 2, 2, 2, c, f)           # [p, a, q, b, c, f]
    return w.transpose(1, 3, 4, 0, 2, 5).reshape(4 * c, 4 * f)


def unpack_w(wp: jnp.ndarray, c: int, f: int) -> jnp.ndarray:
    """Inverse of pack_w: [4C, 4F] -> HWIO [4, 4, C, F] (for the VJP cotangent)."""
    w = wp.reshape(2, 2, c, 2, 2, f)           # [a, b, c, p, q, f]
    return w.transpose(3, 0, 4, 1, 2, 5).reshape(4, 4, c, f)


# ------------------------------------------------------------------- in-kernel pieces

def _elu(a):
    # exp(a) - 1 instead of expm1: Mosaic has no expm1 lowering; max abs error vs
    # expm1 is ~1 ulp of exp(a) (a <= 0 here), far inside the parity tolerances
    return jnp.where(a > 0, a, jnp.exp(a) - 1.0)


def _elu_grad(a):
    return jnp.where(a > 0, jnp.ones_like(a), jnp.exp(a))


def _conv_k2(grid3, w, H: int, F: int):
    """k=2, s=1 VALID conv on a packed grid: [Hp, Wp, C] x [C, 4F] -> [H, H, F] f32.

    One matmul over the UNSLICED grid + four shifted-view adds (taps never staged)."""
    Hp, Wp, C = grid3.shape
    y = jnp.dot(grid3.reshape(Hp * Wp, C), w,
                preferred_element_type=jnp.float32).reshape(Hp, Wp, 4 * F)
    return (y[0:H, 0:H, 0 * F:1 * F] + y[0:H, 1:H + 1, 1 * F:2 * F]
            + y[1:H + 1, 0:H, 2 * F:3 * F] + y[1:H + 1, 1:H + 1, 3 * F:4 * F])


def _pack_phases(e, hp: int, wp: int, F: int, out_ref):
    """Natural [H, H, F] -> padded packed [hp, wp, 4F] written into ``out_ref``.

    out[i, j, (a,b,f)] = epad[2i + a, 2j + b, f]; epad = pad(e, 1).  The row parity
    lives in the untiled outer dim (free); the column parity is a stride-2 sublane
    slice."""
    H = e.shape[0]
    h = H // 2
    out_ref[:] = jnp.zeros((hp, wp, 4 * F), out_ref.dtype)
    for a in (0, 1):
        for b in (0, 1):
            ph = (2 * a + b) * F
            i0, j0 = 1 - a, 1 - b
            # e[2i + a - 1, 2j + b - 1] for i in [i0, i0+h), j in [j0, j0+h)
            r0, s0 = 2 * i0 + a - 1, 2 * j0 + b - 1
            blk = jax.lax.slice(e, (r0, s0, 0),
                                (r0 + 2 * h - 1, s0 + 2 * h - 1, F), (2, 2, 1))
            out_ref[i0:i0 + h, j0:j0 + h, ph:ph + F] = blk.astype(out_ref.dtype)


def _unpack_phases(dp, H: int, F: int):
    """Padded packed [hp, wp, 4F] -> natural [H, H, F] (inverse of _pack_phases)."""
    h = H // 2

    def blk(a, b):
        ph = (2 * a + b) * F
        i0, j0 = 1 - a, 1 - b
        return dp[i0:i0 + h, j0:j0 + h, ph:ph + F]

    # natural row 2u + r: r=0 -> phase a=1; r=1 -> phase a=0 (same for columns)
    row0 = jnp.concatenate([blk(1, 1)[:, :, None, :], blk(1, 0)[:, :, None, :]],
                           axis=2)                       # [h, h, 2, F] (cols of 2u rows)
    row1 = jnp.concatenate([blk(0, 1)[:, :, None, :], blk(0, 0)[:, :, None, :]],
                           axis=2)
    t = jnp.concatenate([row0[:, None], row1[:, None]], axis=1)  # [h, 2, h, 2, F]
    return t.reshape(H, H, F)


def _fill_z(dpre, H: int, F: int, z_ref):
    """Shifted-copies buffer: z[i, j, (p,q,f)] = dpre[i - p, j - q, f] (zeros outside).

    Serves both backward matmuls of a k=2 VALID conv: dW = grid^T @ Z, dIn = Z @ W^T."""
    z_ref[:] = jnp.zeros(z_ref.shape, z_ref.dtype)
    v = dpre.astype(z_ref.dtype)
    for p in (0, 1):
        for q in (0, 1):
            ph = (2 * p + q) * F
            z_ref[p:p + H, q:q + H, ph:ph + F] = v


# ------------------------------------------------------------------- forward kernel

def _enc_head_fwd_kernel(G, C4, F0, F1, H0, H1,
                         xp_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref, e0p_ref):
    w0 = w0_ref[:]
    b0 = b0_ref[:]
    w1 = w1_ref[:]
    b1 = b1_ref[:]
    hp1, wp1 = e0p_ref.shape[0], e0p_ref.shape[1]
    for g in range(G):
        a0 = _conv_k2(xp_ref[g], w0, H0, F0) + b0
        e0 = _elu(a0).astype(xp_ref.dtype)
        _pack_phases(e0, hp1, wp1, F0, e0p_ref)
        a1 = _conv_k2(e0p_ref[:], w1, H1, F1) + b1
        out_ref[g] = _elu(a1).astype(out_ref.dtype)


def _enc_head_fwd_call(xp, w0p, b0, w1p, b1, G: int, interpret: bool):
    B, hp0, wp0, C4 = xp.shape
    F0 = w0p.shape[1] // 4
    F1 = w1p.shape[1] // 4
    H0 = hp0 - 1                      # 64
    H1 = H0 // 2                      # 32
    hp1, wp1 = H1 + 1, _pad8(H1 + 1)
    vm = {"memory_space": pltpu.VMEM} if (_HAS_PLTPU and not interpret) else {}
    scratch = [pltpu.VMEM((hp1, wp1, 4 * F0), xp.dtype)]
    return pl.pallas_call(
        functools.partial(_enc_head_fwd_kernel, G, C4, F0, F1, H0, H1),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, hp0, wp0, C4), lambda i: (i, 0, 0, 0), **vm),
            pl.BlockSpec(w0p.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F0), lambda i: (0, 0), **vm),
            pl.BlockSpec(w1p.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F1), lambda i: (0, 0), **vm),
        ],
        out_specs=pl.BlockSpec((G, H1, H1, F1), lambda i: (i, 0, 0, 0), **vm),
        out_shape=jax.ShapeDtypeStruct((B, H1, H1, F1), xp.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        **_compiler_params(interpret),
    )(xp, w0p, b0.reshape(1, F0).astype(xp.dtype), w1p,
      b1.reshape(1, F1).astype(xp.dtype))


# ------------------------------------------------------------------ backward kernels

def _enc_head_bwd_call(xp, w0p, b0, w1p, b1, g1, G: int, interpret: bool):
    B, hp0, wp0, C4 = xp.shape
    F0 = w0p.shape[1] // 4
    F1 = w1p.shape[1] // 4
    H0 = hp0 - 1
    H1 = H0 // 2
    hp1, wp1 = H1 + 1, _pad8(H1 + 1)
    vm = {"memory_space": pltpu.VMEM} if (_HAS_PLTPU and not interpret) else {}
    kernel = functools.partial(_enc_head_bwd_kernel, G, C4, F0, F1, H0, H1)
    dw0, db0, dw1, db1 = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, hp0, wp0, C4), lambda i: (i, 0, 0, 0), **vm),
            pl.BlockSpec(w0p.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F0), lambda i: (0, 0), **vm),
            pl.BlockSpec(w1p.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F1), lambda i: (0, 0), **vm),
            pl.BlockSpec((G, H1, H1, F1), lambda i: (i, 0, 0, 0), **vm),
        ],
        out_specs=(
            pl.BlockSpec(w0p.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F0), lambda i: (0, 0), **vm),
            pl.BlockSpec(w1p.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F1), lambda i: (0, 0), **vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(w0p.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, F0), jnp.float32),
            jax.ShapeDtypeStruct(w1p.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, F1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((hp1, wp1, 4 * F0), xp.dtype),
            pltpu.VMEM((hp1, wp1, 4 * F1), jnp.float32),
            pltpu.VMEM((hp0, wp0, 4 * F0), jnp.float32),
        ],
        interpret=interpret,
        **_compiler_params(interpret),
    )(xp, w0p, b0.reshape(1, F0).astype(xp.dtype), w1p,
      b1.reshape(1, F1).astype(xp.dtype), g1)
    return dw0, db0[0], dw1, db1[0]


def _enc_head_bwd_kernel(G, C4, F0, F1, H0, H1,
                         xp_ref, w0_ref, b0_ref, w1_ref, b1_ref, g1_ref,
                         dw0_ref, db0_ref, dw1_ref, db1_ref,
                         e0p_ref, z1_ref, z0_ref):
    """Rematerializing backward: weight/bias grads for both stages as f32 accumulators
    across the sequential grid (same-block outputs); the head input's cotangent is a
    separate pallas_call (``_enc_head_dx_call``) so XLA can DCE it when the input is
    training data."""
    w0 = w0_ref[:]
    b0 = b0_ref[:]
    w1 = w1_ref[:]
    b1 = b1_ref[:]
    hp0, wp0 = xp_ref.shape[1], xp_ref.shape[2]
    hp1, wp1 = e0p_ref.shape[0], e0p_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw0_ref[:] = jnp.zeros(dw0_ref.shape, dw0_ref.dtype)
        db0_ref[:] = jnp.zeros(db0_ref.shape, db0_ref.dtype)
        dw1_ref[:] = jnp.zeros(dw1_ref.shape, dw1_ref.dtype)
        db1_ref[:] = jnp.zeros(db1_ref.shape, db1_ref.dtype)

    for g in range(G):
        a0 = _conv_k2(xp_ref[g], w0, H0, F0) + b0
        e0 = _elu(a0).astype(xp_ref.dtype)
        _pack_phases(e0, hp1, wp1, F0, e0p_ref)
        a1 = _conv_k2(e0p_ref[:], w1, H1, F1) + b1
        dpre1 = g1_ref[g].astype(jnp.float32) * _elu_grad(a1)
        _fill_z(dpre1, H1, F1, z1_ref)
        zflat1 = z1_ref[:].reshape(hp1 * wp1, 4 * F1)
        e0flat = e0p_ref[:].reshape(hp1 * wp1, 4 * F0).astype(jnp.float32)
        dw1_ref[:] += jnp.dot(e0flat.T, zflat1, preferred_element_type=jnp.float32)
        db1_ref[:] += jnp.sum(dpre1, axis=(0, 1))[None, :]
        de0p = jnp.dot(zflat1, w1.astype(jnp.float32).T,
                       preferred_element_type=jnp.float32).reshape(hp1, wp1, 4 * F0)
        de0 = _unpack_phases(de0p, H0, F0)
        dpre0 = de0 * _elu_grad(a0)
        _fill_z(dpre0, H0, F0, z0_ref)
        zflat0 = z0_ref[:].reshape(hp0 * wp0, 4 * F0)
        xpflat = xp_ref[g].reshape(hp0 * wp0, C4).astype(jnp.float32)
        dw0_ref[:] += jnp.dot(xpflat.T, zflat0, preferred_element_type=jnp.float32)
        db0_ref[:] += jnp.sum(dpre0, axis=(0, 1))[None, :]


def _enc_head_dx_kernel(G, C4, F0, F1, H0, H1,
                        xp_ref, w0_ref, b0_ref, w1_ref, b1_ref, g1_ref,
                        dxp_ref, e0p_ref, z1_ref, z0_ref):
    """Input cotangent (packed domain): needed only when the head's input requires
    gradients (the Fourier-variant AE, whose input is the residual)."""
    w0 = w0_ref[:]
    b0 = b0_ref[:]
    w1 = w1_ref[:]
    b1 = b1_ref[:]
    hp1, wp1 = e0p_ref.shape[0], e0p_ref.shape[1]
    for g in range(G):
        a0 = _conv_k2(xp_ref[g], w0, H0, F0) + b0
        e0 = _elu(a0).astype(xp_ref.dtype)
        _pack_phases(e0, hp1, wp1, F0, e0p_ref)
        a1 = _conv_k2(e0p_ref[:], w1, H1, F1) + b1
        dpre1 = g1_ref[g].astype(jnp.float32) * _elu_grad(a1)
        _fill_z(dpre1, H1, F1, z1_ref)
        de0p = jnp.dot(z1_ref[:].reshape(hp1 * wp1, 4 * F1),
                       w1.astype(jnp.float32).T,
                       preferred_element_type=jnp.float32).reshape(hp1, wp1, 4 * F0)
        de0 = _unpack_phases(de0p, H0, F0)
        dpre0 = de0 * _elu_grad(a0)
        _fill_z(dpre0, H0, F0, z0_ref)
        dxp_ref[g] = jnp.dot(
            z0_ref[:].reshape(z0_ref.shape[0] * z0_ref.shape[1], 4 * F0),
            w0.astype(jnp.float32).T, preferred_element_type=jnp.float32,
        ).reshape(dxp_ref.shape[1], dxp_ref.shape[2], C4).astype(dxp_ref.dtype)


def _enc_head_dx_call(xp, w0p, b0, w1p, b1, g1, G: int, interpret: bool):
    B, hp0, wp0, C4 = xp.shape
    F0 = w0p.shape[1] // 4
    F1 = w1p.shape[1] // 4
    H0 = hp0 - 1
    H1 = H0 // 2
    hp1, wp1 = H1 + 1, _pad8(H1 + 1)
    vm = {"memory_space": pltpu.VMEM} if (_HAS_PLTPU and not interpret) else {}
    return pl.pallas_call(
        functools.partial(_enc_head_dx_kernel, G, C4, F0, F1, H0, H1),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, hp0, wp0, C4), lambda i: (i, 0, 0, 0), **vm),
            pl.BlockSpec(w0p.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F0), lambda i: (0, 0), **vm),
            pl.BlockSpec(w1p.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F1), lambda i: (0, 0), **vm),
            pl.BlockSpec((G, H1, H1, F1), lambda i: (i, 0, 0, 0), **vm),
        ],
        out_specs=pl.BlockSpec((G, hp0, wp0, C4), lambda i: (i, 0, 0, 0), **vm),
        out_shape=jax.ShapeDtypeStruct((B, hp0, wp0, C4), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((hp1, wp1, 4 * F0), xp.dtype),
            pltpu.VMEM((hp1, wp1, 4 * F1), jnp.float32),
            pltpu.VMEM((hp0, wp0, 4 * F0), jnp.float32),
        ],
        interpret=interpret,
        **_compiler_params(interpret),
    )(xp, w0p, b0.reshape(1, F0).astype(xp.dtype), w1p,
      b1.reshape(1, F1).astype(xp.dtype), g1)


# --------------------------------------------------------------------- custom VJP

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def enc_head_packed(xp, w0p, b0, w1p, b1, G: int = 4, interpret: bool = False):
    """elu(conv1(elu(conv0(.)))) on a pre-packed input (see ``s2d_pad``/``pack_w``).

    xp [B, 65, 72, 4C] packed input; w0p [4C, 4F0]; w1p [4F0, 4F1].
    Returns [B, 32, 32, F1] natural NHWC.
    """
    return _enc_head_fwd_call(xp, w0p, b0, w1p, b1, G, interpret)


def _enc_head_vjp_fwd(xp, w0p, b0, w1p, b1, G: int, interpret: bool):
    out = _enc_head_fwd_call(xp, w0p, b0, w1p, b1, G, interpret)
    return out, (xp, w0p, b0, w1p, b1)


def _enc_head_vjp_bwd(G: int, interpret: bool, res, g1):
    xp, w0p, b0, w1p, b1 = res
    dw0, db0, dw1, db1 = _enc_head_bwd_call(xp, w0p, b0, w1p, b1, g1, G, interpret)
    # Input cotangent as its own pallas_call: when the head input is training data
    # (no gradient needed) XLA dead-code-eliminates this call entirely.
    dxp = _enc_head_dx_call(xp, w0p, b0, w1p, b1, g1, G, interpret).astype(xp.dtype)
    return (dxp, dw0.astype(w0p.dtype), db0.astype(b0.dtype),
            dw1.astype(w1p.dtype), db1.astype(b1.dtype))


enc_head_packed.defvjp(_enc_head_vjp_fwd, _enc_head_vjp_bwd)


def enc_head(x, w0_hwio, b0, w1_hwio, b1, G: int = 4, interpret: bool | None = None):
    """Convenience wrapper on natural NHWC input [B, P, P, C] and HWIO kernels.

    Equivalent (parity-tested) to
        elu(conv1(elu(conv0(x) + b0)) + b1)
    with conv = k=4, s=2, p=1.  ``interpret=None`` auto-selects interpret mode off-TPU
    (hermetic CPU tests), matching the khm_pallas convention."""
    if interpret is None:
        interpret = not pallas_conv_available()
    B = x.shape[0]
    g = min(G, B)
    while B % g:                      # largest divisor of B not above G (grid must
        g -= 1                        # cover the batch exactly; leftover rows would
    xp = s2d_pad(x)                   # come back uninitialized)
    w0p = pack_w(w0_hwio).astype(x.dtype)
    w1p = pack_w(w1_hwio).astype(x.dtype)
    return enc_head_packed(xp, w0p, b0, w1p, b1, g, interpret)
