"""Fused Pallas TPU kernels for the 2D AE's full-resolution conv stages.

The flagship step is bound by its outermost conv stages (conv0/conv1 encoder —
reference ladder src/lofar_models.py:31-41): 4-12 channels on a 128-lane MXU leave
XLA's conv emitter at 5-12% utilization, and the surrounding bias/ELU/cotangent glue
materializes full-resolution intermediates in HBM.  This kernel keeps both outer
encoder stages (conv + bias + ELU, twice) in one VMEM pass, with a custom VJP whose
backward kernel rematerializes the forward in VMEM and emits weight/bias gradients —
no full-resolution intermediate ever round-trips through HBM between the stages.

Math: every k=4, s=2, p=1 conv satisfies the zero-tap-duplication space-to-depth
identity (see conv2d_s2_packed in lshm_tpu/models/autoencoders.py): with the packed
grid xp[i, j, (a, b, c)] = xpad[2i + a, 2j + b, c] and tap-major packed weights
W[(a, b, c), (p, q, f)],

    a0[r, s] = sum_{p,q} y[r + p, s + q, (p, q, :)],     y = xp @ W.

Chaining TWO such stages inside one kernel requires re-packing the stage-0 output
for stage 1 — a parity (stride-2) split, which Mosaic cannot lower as a vector op
('vector.extract_strided_slice' demands stride 1).  The kernel therefore works in a
DOUBLE-packed domain where every access is a stride-1 slice:

    xp4[i2, j2, (alpha, beta, a, b, c)] = xp[2*i2 + alpha, 2*j2 + beta, (a, b, c)]

(s4d_pad, computed once in XLA where strided relayouts are free; under the unrolled
ADMM loop it CSEs to once per minibatch).  Stage 0 is ONE full-grid matmul against a
block-diagonal weight kron(I_4, W0p): Y4 = xp4 @ W0big keeps y's four spatial
parities in separate channel blocks, so the stage-1 packed input

    e0p[i, j, (a, b, f)] = elu(a0[2i + a - 1, 2j + b - 1, f] + b0)

assembles from stride-1 shifted views of Y4: row index 2i + a - 1 + p of y lands in
parity block alpha = 1 - (a XOR p) at row offset i - [a == 0 and p == 0].  Stage 1
then consumes e0p with the ordinary single-packed identity.  The backward never
leaves the packed domain at all (e0p's cotangent chains elementwise against the
saved packed pre-activations), needs no parity unpack, and serves both gradients of
each stage with one transposed matmul (dW = in^T @ dY, dIn = dY @ W^T).

All grid/matmul reshapes keep the packed column dim padded to a sublane-tile
multiple so [G, Q, Qp, C] <-> [G*Q*Qp, C] is relayout-free, and the whole G-sample
block is processed as single batched matmuls (no per-sample loop in-kernel).

The head's input gradient is computed by a separate pallas_call so XLA can DCE it
when the head input is training data (the primary AE; the Fourier-variant AE
consumes residuals and keeps it).
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


def _require_pltpu() -> None:
    """The kernels declare VMEM scratch buffers, which need pallas.tpu even in
    interpret mode — without it every pallas_call would fail with a confusing
    kernel-arity error, so refuse up front with an actionable message."""
    if not _HAS_PLTPU:
        raise ImportError(
            "lshm_tpu.kernels.conv2d_outer requires jax.experimental.pallas.tpu "
            "(unavailable in this jax install); use the default XLA conv path "
            "(ModelConfig.pallas_head=0)"
        )


def _subtile(dtype) -> int:
    """Sublane tile extent: 8 for 32-bit, 16 for bf16 (packed sublanes)."""
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def _padto(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _compiler_params(interpret: bool):
    """Raised scoped-VMEM cap: the double-packed buffers hold the full G-block at
    full resolution, so useful G needs more than the default 16 MiB scope.

    The default (96 MiB) assumes v5e/v4-class cores with 128 MiB of VMEM — the
    only platforms this kernel has been compiled on.  On generations with less
    VMEM set LSHM_PALLAS_VMEM_MB lower (the grid G then needs to shrink too);
    the kernel is opt-in (ModelConfig.pallas_head, default off)."""
    if interpret or not _HAS_PLTPU:
        return {}
    import os

    mb = int(os.environ.get("LSHM_PALLAS_VMEM_MB", "96"))
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=mb * 1024 * 1024)}


# ------------------------------------------------------------------ XLA-side packing

def s2d_pad(x: jnp.ndarray) -> jnp.ndarray:
    """[B, P, P, C] -> padded packed [B, P/2+1, pad(P/2+1), 4C] (single packing).

    packed channel (a, b, c): xp[i, j] = xpad[2i + a, 2j + b], xpad = pad(x, 1).
    Kept for conv2d_s2_packed parity tests and the standalone probe."""
    n, h, w, c = x.shape
    hp = h // 2 + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(n, hp, 2, hp, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(n, hp, hp, 4 * c)
    return jnp.pad(xp, ((0, 0), (0, 0), (0, _padto(hp, _subtile(x.dtype)) - hp),
                        (0, 0)))


def s4d_pad(x: jnp.ndarray) -> jnp.ndarray:
    """[B, P, P, C] -> double-packed [B, Q, pad(Q), 16C], Q = P/4 + 1.

    Channel order (alpha, beta, a, b, c), value xpad2[4*i2 + 2*alpha + a,
    4*j2 + 2*beta + b, c] with xpad2 = pad(x, ((1, 3), (1, 3))) — i.e. the
    stage-0 packed grid xp's rows/columns split by parity:
    xp4[i2, j2, (alpha, beta, :)] = xp[2*i2 + alpha, 2*j2 + beta, :]."""
    n, h, w, c = x.shape
    assert h == w and h % 4 == 0, (h, w)
    q = h // 4 + 1
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
    xp = xp.reshape(n, q, 2, 2, q, 2, 2, c)       # (B, i2, alpha, a, j2, beta, b, c)
    xp = xp.transpose(0, 1, 4, 2, 5, 3, 6, 7)     # (B, i2, j2, alpha, beta, a, b, c)
    xp = xp.reshape(n, q, q, 16 * c)
    return jnp.pad(xp, ((0, 0), (0, 0), (0, _padto(q, _subtile(x.dtype)) - q),
                        (0, 0)))


def pack_w(w4: jnp.ndarray) -> jnp.ndarray:
    """HWIO [4, 4, C, F] -> [4C, 4F]: rows = packed channel (a, b, c), columns
    tap-major (p, q, f): wp[(a,b,c), (p,q,f)] = w4[2p + a, 2q + b, c, f]."""
    c, f = w4.shape[2], w4.shape[3]
    w = w4.reshape(2, 2, 2, 2, c, f)           # [p, a, q, b, c, f]
    return w.transpose(1, 3, 4, 0, 2, 5).reshape(4 * c, 4 * f)


def unpack_w(wp: jnp.ndarray, c: int, f: int) -> jnp.ndarray:
    """Inverse of pack_w: [4C, 4F] -> HWIO [4, 4, C, F]."""
    w = wp.reshape(2, 2, c, 2, 2, f)           # [a, b, c, p, q, f]
    return w.transpose(3, 0, 4, 1, 2, 5).reshape(4, 4, c, f)


# ------------------------------------------------------------------- in-kernel pieces

def _elu(a):
    # exp(a) - 1 instead of expm1: Mosaic has no expm1 lowering; max abs error vs
    # expm1 is ~1 ulp of exp(a) (a <= 0 here), far inside the parity tolerances
    return jnp.where(a > 0, a, jnp.exp(a) - 1.0)


def _elu_grad(a):
    return jnp.where(a > 0, jnp.ones_like(a), jnp.exp(a))


def _shift(a: int, p: int) -> tuple[int, int]:
    """Stage-0 parity bookkeeping: y row 2i + a - 1 + p lives in parity block
    alpha at block-row i + di.  Returns (alpha, di)."""
    return 1 - (a ^ p), (-1 if (a == 0 and p == 0) else 0)


def _ch0(alpha: int, beta: int, p: int, q: int, F0: int) -> int:
    """Channel offset of block (alpha, beta, p, q) in Y4's (alpha,beta,p,q,f) axis."""
    return ((2 * alpha + beta) * 4 + (2 * p + q)) * F0


def _stage0_y4(xp4_flat, w0_ref, G, Q, Qp, F0, ypad_ref):
    """Y4 = xp4 @ W0big as one batched matmul, written into the zero-bordered
    ypad scratch (border row/col 0 = y's out-of-range reads, exactly zero)."""
    ypad_ref[:] = jnp.zeros(ypad_ref.shape, ypad_ref.dtype)
    y4 = jnp.dot(xp4_flat, w0_ref[:],
                 preferred_element_type=jnp.float32).reshape(G, Q, Qp, 16 * F0)
    ypad_ref[:, 1:Q + 1, 1:Qp + 1, :] = y4


def _phase_pre(ypad_ref, a: int, b: int, G: int, Q: int, Qp: int, F0: int, b0):
    """Packed pre-activation of stage-0 phase (a, b): [G, Q, Qp, F0] f32, garbage at
    the phase's invalid border (masked by interior-only writes downstream)."""
    acc = None
    for p in (0, 1):
        al, di = _shift(a, p)
        for q in (0, 1):
            be, dj = _shift(b, q)
            ch = _ch0(al, be, p, q, F0)
            t = ypad_ref[:, 1 + di:1 + di + Q, 1 + dj:1 + dj + Qp, ch:ch + F0]
            acc = t if acc is None else acc + t
    return acc + b0


def _stage0_e0p(xp4_flat, w0_ref, b0, G, Q, Qp, F0, ypad_ref, e0p_ref,
                pre_ref=None):
    """Fill e0p (packed stage-1 input, zero borders) and optionally save the
    unmasked packed pre-activations for the backward's elu' chain."""
    _stage0_y4(xp4_flat, w0_ref, G, Q, Qp, F0, ypad_ref)
    H = Q - 1                                  # valid extent per phase
    e0p_ref[:] = jnp.zeros(e0p_ref.shape, e0p_ref.dtype)
    for a in (0, 1):
        for b in (0, 1):
            pre = _phase_pre(ypad_ref, a, b, G, Q, Qp, F0, b0)
            ph = (2 * a + b) * F0
            if pre_ref is not None:
                pre_ref[:, :, :, ph:ph + F0] = pre
            ra, cb = 1 - a, 1 - b
            e0p_ref[:, ra:ra + H, cb:cb + H, ph:ph + F0] = (
                _elu(pre[:, ra:ra + H, cb:cb + H, :]).astype(e0p_ref.dtype))


def _stage1_a1(e0p_ref, w1_ref, b1, G, Q, Qp, F1, H1):
    """Stage-1 pre-activation on the packed e0p: one matmul + four shifted adds."""
    y1 = jnp.dot(e0p_ref[:].reshape(G * Q * Qp, e0p_ref.shape[-1]), w1_ref[:],
                 preferred_element_type=jnp.float32).reshape(G, Q, Qp, 4 * F1)
    acc = None
    for p in (0, 1):
        for q in (0, 1):
            ch = (2 * p + q) * F1
            t = y1[:, p:p + H1, q:q + H1, ch:ch + F1]
            acc = t if acc is None else acc + t
    return acc + b1


# ------------------------------------------------------------------- forward kernel

def _fwd_kernel(G, Q, Qp, F0, F1, H1,
                xp4_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref,
                ypad_ref, e0p_ref):
    xp4_flat = xp4_ref[:].reshape(G * Q * Qp, xp4_ref.shape[-1])
    _stage0_e0p(xp4_flat, w0_ref, b0_ref[:].astype(jnp.float32),
                G, Q, Qp, F0, ypad_ref, e0p_ref)
    a1 = _stage1_a1(e0p_ref, w1_ref, b1_ref[:].astype(jnp.float32),
                    G, Q, Qp, F1, H1)
    out_ref[:] = _elu(a1).astype(out_ref.dtype)


def _scratch(xp4, F0, F1, Q, Qp, G, with_bwd: bool):
    st = _subtile(xp4.dtype)
    ypad = pltpu.VMEM((G, Q + 1, _padto(Qp + 1, 8), 16 * F0), jnp.float32)
    e0p = pltpu.VMEM((G, Q, Qp, 4 * F0), xp4.dtype)
    if not with_bwd:
        return [ypad, e0p], st
    pre = pltpu.VMEM((G, Q, Qp, 4 * F0), jnp.float32)
    z1 = pltpu.VMEM((G, Q, Qp, 4 * F1), jnp.float32)
    return [ypad, e0p, pre, z1], st


def _fwd_call(xp4, w0big, b0, w1p, b1, G: int, interpret: bool):
    B, Q, Qp, C16 = xp4.shape
    F0 = w0big.shape[1] // 16
    F1 = w1p.shape[1] // 4
    H1 = Q - 1
    _require_pltpu()
    vm = {"memory_space": pltpu.VMEM} if not interpret else {}
    scratch, _ = _scratch(xp4, F0, F1, Q, Qp, G, False)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, G, Q, Qp, F0, F1, H1),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Q, Qp, C16), lambda i: (i, 0, 0, 0), **vm),
            pl.BlockSpec(w0big.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F0), lambda i: (0, 0), **vm),
            pl.BlockSpec(w1p.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F1), lambda i: (0, 0), **vm),
        ],
        out_specs=pl.BlockSpec((G, H1, H1, F1), lambda i: (i, 0, 0, 0), **vm),
        out_shape=jax.ShapeDtypeStruct((B, H1, H1, F1), xp4.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        **_compiler_params(interpret),
    )(xp4, w0big, b0.reshape(1, F0).astype(jnp.float32), w1p,
      b1.reshape(1, F1).astype(jnp.float32))


# ------------------------------------------------------------------ backward kernels

def _bwd_common(G, Q, Qp, F0, F1, H1,
                xp4_ref, w0_ref, b0_ref, w1_ref, g1_ref,
                ypad_ref, e0p_ref, pre_ref, z1_ref, b1_ref):
    """Shared rematerialization + cotangent plumbing for both backward kernels.

    Returns (xp4_flat, dpre1, phase bias sums); ypad_ref ends holding dYpad —
    Y4 is dead once the packed pre-activations are saved in pre_ref, so the
    largest scratch is reused as the cotangent buffer (halves peak VMEM)."""
    xp4_flat = xp4_ref[:].reshape(G * Q * Qp, xp4_ref.shape[-1])
    _stage0_e0p(xp4_flat, w0_ref, b0_ref[:].astype(jnp.float32),
                G, Q, Qp, F0, ypad_ref, e0p_ref, pre_ref)
    dypad_ref = ypad_ref          # Y4 dead from here on; alias as dYpad
    a1 = _stage1_a1(e0p_ref, w1_ref, b1_ref[:].astype(jnp.float32),
                    G, Q, Qp, F1, H1)
    dpre1 = g1_ref[:].astype(jnp.float32) * _elu_grad(a1)

    # stage-1 shifted-copies buffer: z1[i,j,(p,q,f)] = dpre1[i-p, j-q, f]
    z1_ref[:] = jnp.zeros(z1_ref.shape, z1_ref.dtype)
    for p in (0, 1):
        for q in (0, 1):
            ch = (2 * p + q) * F1
            z1_ref[:, p:p + H1, q:q + H1, ch:ch + F1] = dpre1

    # e0p cotangent (packed domain; no parity unpack needed)
    de0p = jnp.dot(z1_ref[:].reshape(G * Q * Qp, 4 * F1),
                   w1_ref[:].astype(jnp.float32).T,
                   preferred_element_type=jnp.float32).reshape(G, Q, Qp, 4 * F0)

    # dY4 (transpose of the forward's shifted reads), masked to each phase's valid
    # interior — invalid e0p entries are constant zero, so no gradient flows there
    dypad_ref[:] = jnp.zeros(dypad_ref.shape, dypad_ref.dtype)
    H = Q - 1
    phase_sums = []
    for a in (0, 1):
        for b in (0, 1):
            ph = (2 * a + b) * F0
            ra, cb = 1 - a, 1 - b
            dint = (de0p[:, ra:ra + H, cb:cb + H, ph:ph + F0]
                    * _elu_grad(pre_ref[:, ra:ra + H, cb:cb + H, ph:ph + F0]))
            phase_sums.append(jnp.sum(dint, axis=(0, 1, 2)))
            for p in (0, 1):
                al, di = _shift(a, p)
                for q in (0, 1):
                    be, dj = _shift(b, q)
                    ch = _ch0(al, be, p, q, F0)
                    dypad_ref[:, 1 + di + ra:1 + di + ra + H,
                              1 + dj + cb:1 + dj + cb + H, ch:ch + F0] = dint
    return xp4_flat, dpre1, phase_sums


def _bwd_kernel(G, Q, Qp, F0, F1, H1,
                xp4_ref, w0_ref, b0_ref, w1_ref, b1_ref, g1_ref,
                dw0_ref, db0_ref, dw1_ref, db1_ref,
                ypad_ref, e0p_ref, pre_ref, z1_ref):
    """Weight/bias grads for both stages, f32-accumulated across the sequential
    grid (same-block outputs); the head input's cotangent is a separate pallas_call
    (``_dx_call``) so XLA can DCE it when the input is training data."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw0_ref[:] = jnp.zeros(dw0_ref.shape, dw0_ref.dtype)
        db0_ref[:] = jnp.zeros(db0_ref.shape, db0_ref.dtype)
        dw1_ref[:] = jnp.zeros(dw1_ref.shape, dw1_ref.dtype)
        db1_ref[:] = jnp.zeros(db1_ref.shape, db1_ref.dtype)

    xp4_flat, dpre1, phase_sums = _bwd_common(
        G, Q, Qp, F0, F1, H1, xp4_ref, w0_ref, b0_ref, w1_ref, g1_ref,
        ypad_ref, e0p_ref, pre_ref, z1_ref, b1_ref)

    db1_ref[:] += jnp.sum(dpre1, axis=(0, 1, 2))[None, :]
    dw1_ref[:] += jnp.dot(
        e0p_ref[:].reshape(G * Q * Qp, 4 * F0).astype(jnp.float32).T,
        z1_ref[:].reshape(G * Q * Qp, 4 * F1),
        preferred_element_type=jnp.float32)
    db0_ref[:] += jnp.concatenate(phase_sums)[None, :]
    dy4 = ypad_ref[:, 1:Q + 1, 1:Qp + 1, :].reshape(G * Q * Qp, 16 * F0)
    dw0_ref[:] += jnp.dot(xp4_flat.astype(jnp.float32).T, dy4,
                          preferred_element_type=jnp.float32)


def _bwd_call(xp4, w0big, b0, w1p, b1, g1, G: int, interpret: bool):
    B, Q, Qp, C16 = xp4.shape
    F0 = w0big.shape[1] // 16
    F1 = w1p.shape[1] // 4
    H1 = Q - 1
    _require_pltpu()
    vm = {"memory_space": pltpu.VMEM} if not interpret else {}
    scratch, _ = _scratch(xp4, F0, F1, Q, Qp, G, True)
    dw0, db0p, dw1, db1 = pl.pallas_call(
        functools.partial(_bwd_kernel, G, Q, Qp, F0, F1, H1),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Q, Qp, C16), lambda i: (i, 0, 0, 0), **vm),
            pl.BlockSpec(w0big.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F0), lambda i: (0, 0), **vm),
            pl.BlockSpec(w1p.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F1), lambda i: (0, 0), **vm),
            pl.BlockSpec((G, H1, H1, F1), lambda i: (i, 0, 0, 0), **vm),
        ],
        out_specs=(
            pl.BlockSpec(w0big.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, 4 * F0), lambda i: (0, 0), **vm),
            pl.BlockSpec(w1p.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F1), lambda i: (0, 0), **vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(w0big.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * F0), jnp.float32),
            jax.ShapeDtypeStruct(w1p.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, F1), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        **_compiler_params(interpret),
    )(xp4, w0big, b0.reshape(1, F0).astype(jnp.float32), w1p,
      b1.reshape(1, F1).astype(jnp.float32), g1)
    # fold the per-phase bias sums (a, b, f) -> f
    return dw0, jnp.sum(db0p.reshape(4, F0), axis=0), dw1, db1[0]


def _dx_kernel(G, Q, Qp, F0, F1, H1,
               xp4_ref, w0_ref, b0_ref, w1_ref, b1_ref, g1_ref, dxp4_ref,
               ypad_ref, e0p_ref, pre_ref, z1_ref):
    """Input cotangent (double-packed domain): needed only when the head's input
    requires gradients (the Fourier-variant AE, whose input is the residual)."""
    _, _, _ = _bwd_common(
        G, Q, Qp, F0, F1, H1, xp4_ref, w0_ref, b0_ref, w1_ref, g1_ref,
        ypad_ref, e0p_ref, pre_ref, z1_ref, b1_ref)
    dy4 = ypad_ref[:, 1:Q + 1, 1:Qp + 1, :].reshape(G * Q * Qp, 16 * F0)
    dxp4_ref[:] = jnp.dot(
        dy4, w0_ref[:].astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    ).reshape(G, Q, Qp, xp4_ref.shape[-1]).astype(dxp4_ref.dtype)


def _dx_call(xp4, w0big, b0, w1p, b1, g1, G: int, interpret: bool):
    B, Q, Qp, C16 = xp4.shape
    F0 = w0big.shape[1] // 16
    F1 = w1p.shape[1] // 4
    H1 = Q - 1
    _require_pltpu()
    vm = {"memory_space": pltpu.VMEM} if not interpret else {}
    scratch, _ = _scratch(xp4, F0, F1, Q, Qp, G, True)
    return pl.pallas_call(
        functools.partial(_dx_kernel, G, Q, Qp, F0, F1, H1),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Q, Qp, C16), lambda i: (i, 0, 0, 0), **vm),
            pl.BlockSpec(w0big.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F0), lambda i: (0, 0), **vm),
            pl.BlockSpec(w1p.shape, lambda i: (0, 0), **vm),
            pl.BlockSpec((1, F1), lambda i: (0, 0), **vm),
            pl.BlockSpec((G, H1, H1, F1), lambda i: (i, 0, 0, 0), **vm),
        ],
        out_specs=pl.BlockSpec((G, Q, Qp, C16), lambda i: (i, 0, 0, 0), **vm),
        out_shape=jax.ShapeDtypeStruct((B, Q, Qp, C16), xp4.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        **_compiler_params(interpret),
    )(xp4, w0big, b0.reshape(1, F0).astype(jnp.float32), w1p,
      b1.reshape(1, F1).astype(jnp.float32), g1)


# --------------------------------------------------------------------- custom VJP

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def enc_head_packed(xp4, w0big, b0, w1p, b1, G: int = 4, interpret: bool = False):
    """elu(conv1(elu(conv0(.)))) on a double-packed input (see ``s4d_pad``).

    xp4 [B, Q, Qp, 16C] double-packed input; w0big [16C, 16F0] = kron(I_4, pack_w(w0))
    (block-diagonal — XLA autodiff through the kron folds dW0big's diagonal blocks
    back to dW0); w1p [4F0, 4F1] = pack_w(w1).  Returns [B, P/4, P/4, F1] natural
    NHWC.
    """
    return _fwd_call(xp4, w0big, b0, w1p, b1, G, interpret)


def _vjp_fwd(xp4, w0big, b0, w1p, b1, G: int, interpret: bool):
    out = _fwd_call(xp4, w0big, b0, w1p, b1, G, interpret)
    return out, (xp4, w0big, b0, w1p, b1)


def _vjp_bwd(G: int, interpret: bool, res, g1):
    xp4, w0big, b0, w1p, b1 = res
    dw0, db0, dw1, db1 = _bwd_call(xp4, w0big, b0, w1p, b1, g1, G, interpret)
    # Input cotangent as its own pallas_call: when the head input is training data
    # (no gradient needed) XLA dead-code-eliminates this call entirely.
    dxp4 = _dx_call(xp4, w0big, b0, w1p, b1, g1, G, interpret).astype(xp4.dtype)
    return (dxp4, dw0.astype(w0big.dtype), db0.astype(b0.dtype),
            dw1.astype(w1p.dtype), db1.astype(b1.dtype))


enc_head_packed.defvjp(_vjp_fwd, _vjp_bwd)


def enc_head(x, w0_hwio, b0, w1_hwio, b1, G: int = 10, interpret: bool | None = None):
    """Convenience wrapper on natural NHWC input [B, P, P, C] and HWIO kernels.

    Equivalent (parity-tested) to
        elu(conv1(elu(conv0(x) + b0)) + b1)
    with conv = k=4, s=2, p=1 (the reference encoder's two outermost stages,
    reference: src/lofar_models.py:31-34).  ``interpret=None`` auto-selects
    interpret mode off-TPU (hermetic CPU tests), matching the khm_pallas
    convention.  G=10 default: the backward kernel compiles up to G=10 on v5e
    (G=15 crashes the Mosaic compile helper; bisected 2026-08-19)."""
    if interpret is None:
        interpret = not pallas_conv_available()
    B = x.shape[0]
    g = min(G, B)
    # The grid must cover the batch exactly (leftover rows would come back
    # uninitialized).  Rather than silently degrading to a tiny divisor of B
    # (worst case g=1 for prime B — a large hidden throughput cliff for a kernel
    # that exists purely for speed), pad the batch up to a multiple of g with
    # zero rows and slice them back off; the pad rows' output cotangent is zero,
    # so weight/bias gradients are unaffected.
    Bp = _padto(B, g)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0), (0, 0)))
    xp4 = s4d_pad(x)
    w0big = jnp.kron(jnp.eye(4, dtype=x.dtype), pack_w(w0_hwio).astype(x.dtype))
    w1p = pack_w(w1_hwio).astype(x.dtype)
    out = enc_head_packed(xp4, w0big, b0, w1p, b1, g, interpret)
    return out[:B] if Bp != B else out
