"""Standalone calibration: Pallas phase-packed conv0 forward vs XLA's conv emitter.

Decision gate for the full fused outer-stage kernel (VERDICT r4 item 2): if a
VMEM-resident phase-packed kernel cannot beat XLA's standalone conv0 (k=4, s=2, p=1,
4->8 ch, 128^2, bias + ELU fused) it cannot win composed either, and the honest
negative gets recorded without spending the full custom-VJP effort.

Kernel math = the zero-tap-duplication space-to-depth identity
(lshm_tpu/models/autoencoders.py::conv2d_s2_packed): pad 1 -> s2d [65, 65, 4C]
(done once in XLA, included in the timed Pallas path) -> k=2, s=1 VALID conv.
In-kernel the k=2 conv is ONE matmul over the UNSLICED packed grid
([65*65, 4C] x [4C, 4F] = all four taps at once) followed by four shifted-view adds
— no im2col staging, no strided loads on the matmul operands.

Usage: python benchmarks/pallas_conv_probe.py [--batch 420] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def s2d_pad(x):
    """[B, P, P, C] -> padded packed [B, P/2+1, P/2+1, 4C] (XLA side, one relayout)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(n, (h + 2) // 2, 2, (w + 2) // 2, 2, c)
    return xp.transpose(0, 1, 3, 2, 4, 5).reshape(n, (h + 2) // 2, (w + 2) // 2, 4 * c)


def pack_w(w4):
    """HWIO [4,4,C,F] -> [4C, 4F]: columns grouped by tap (p,q), rows by phase (a,b,c).

    wp[(a,b,c), (p,q,f)] = w4[2p+a, 2q+b, c, f]
    """
    c, f = w4.shape[2], w4.shape[3]
    w = w4.reshape(2, 2, 2, 2, c, f)           # [p, a, q, b, c, f]
    w = w.transpose(1, 3, 4, 0, 2, 5)          # [a, b, c, p, q, f]
    return w.reshape(4 * c, 4 * f)


def _kernel(G: int, C4: int, F: int, xp_ref, w_ref, b_ref, out_ref):
    """xp_ref [G, 65, 65, C4] -> out_ref [G, 64, 64, F] = elu(conv + bias)."""
    Hp = xp_ref.shape[1]             # 65
    H = Hp - 1                       # 64
    w = w_ref[:]                     # [C4, 4F]
    b = b_ref[:]                     # [1, F]
    for g in range(G):
        grid_in = xp_ref[g].reshape(Hp * Hp, C4)
        y = jnp.dot(grid_in, w, preferred_element_type=jnp.float32)
        y = y.reshape(Hp, Hp, 4 * F)
        acc = (
            y[0:H, 0:H, 0 * F:1 * F]          # tap (p=0, q=0)
            + y[0:H, 1:Hp, 1 * F:2 * F]       # tap (p=0, q=1)
            + y[1:Hp, 0:H, 2 * F:3 * F]       # tap (p=1, q=0)
            + y[1:Hp, 1:Hp, 3 * F:4 * F]      # tap (p=1, q=1)
            + b
        )
        # exp - 1 (not expm1): Mosaic has no expm1 lowering
        out_ref[g] = jnp.where(acc > 0, acc, jnp.exp(acc) - 1.0).astype(out_ref.dtype)


def conv0_pallas(x, w4, bias, G=4, vmem_mb=96):
    """x [B,128,128,C] natural NHWC; returns elu(conv0(x) + b) [B,64,64,F]."""
    B, P, _, C = x.shape
    F = w4.shape[-1]
    xp = s2d_pad(x)
    wp = pack_w(w4).astype(x.dtype)
    Hp = P // 2 + 1
    grid = (B // G,)
    return pl.pallas_call(
        functools.partial(_kernel, G, 4 * C, F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, Hp, Hp, 4 * C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * C, 4 * F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, P // 2, P // 2, F), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P // 2, P // 2, F), x.dtype),
        # thin-channel blocks pad lanes 4C->128, so the footprint is ~8x the logical
        # bytes; raise the scoped-VMEM cap (v5e has 128 MiB) instead of shrinking G
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(xp, wp, bias.reshape(1, F).astype(x.dtype))


def conv0_xla(x, w4, bias):
    y = lax.conv_general_dilated(
        x, w4.astype(x.dtype), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(x.dtype)
    return jax.nn.elu(y)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=420)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--g", type=int, default=4)
    ap.add_argument("--vmem-mb", type=int, default=96)
    args = ap.parse_args()
    from decompose import time_fn

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)
    C, F = 4, 8
    x = jax.random.normal(key, (args.batch, 128, 128, C), dt)
    w4 = jax.random.normal(jax.random.fold_in(key, 1), (4, 4, C, F), jnp.float32) * 0.1
    bias = jax.random.normal(jax.random.fold_in(key, 2), (F,), jnp.float32) * 0.1

    # numeric parity first (f32, small batch)
    xs = jax.random.normal(jax.random.fold_in(key, 3), (8, 128, 128, C), jnp.float32)
    a = jax.jit(lambda v: conv0_pallas(v, w4, bias, G=4, vmem_mb=args.vmem_mb))(xs)
    ref = jax.jit(lambda v: conv0_xla(v, w4, bias))(xs)
    err = float(jnp.max(jnp.abs(a - ref)))
    print(json.dumps({"parity_max_abs_err": err}), flush=True)
    assert err < 1e-4, err

    for name, fn in [("xla", lambda v: conv0_xla(v, w4, bias)),
                     ("pallas", lambda v: conv0_pallas(v, w4, bias, G=args.g,
                                                       vmem_mb=args.vmem_mb))]:
        r = time_fn(fn, (x,))
        print(json.dumps({"impl": name, "batch": args.batch, "dtype": args.dtype,
                          **r}), flush=True)


if __name__ == "__main__":
    main()
