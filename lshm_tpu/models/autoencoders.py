"""Convolutional autoencoders with uv-harmonic positional features (Flax).

TPU-native re-design of the reference autoencoders (reference: src/lofar_models.py:12-184):

- NHWC / NWC layouts (XLA's native TPU conv layouts) instead of NCHW/NCW.
- Same topology: 6 stride-2 (2D) or stride-4 (1D) conv stages with channel ladder
  in->8->12->24->48->96->192, ELU activations, a 768-dim bottleneck flatten, a
  kron-harmonic (sin, cos) uv embedding mixed in through small dense layers, and a
  mirrored transposed-conv decoder.
- Optional RICA (reconstruction ICA) heads: two extra dense layers between encode and
  decode whose intermediate activation is the *sparse* latent returned for clustering
  (reference: src/lofar_models.py:47-49,64-69).
- Fixes a reference defect: the 1D AE's non-RICA path called decode() without the uv
  argument and would crash (reference: src/lofar_models.py:150); here decode always
  takes uv.

All modules are shape-polymorphic in the batch dimension only; spatial dims are static
so XLA tiles every conv onto the MXU.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

# channel ladder of the 6 conv stages (reference: src/lofar_models.py:31-41)
CHANNEL_LADDER = (8, 12, 24, 48, 96, 192)
BOTTLENECK = 192 * 2 * 2  # 768


@jax.custom_jvp
def elu(x: jnp.ndarray) -> jnp.ndarray:
    """ELU (alpha=1) with an analytic derivative — same values and gradients as
    ``jax.nn.elu`` (parity-tested incl. grads), cheaper XLA graph on TPU.

    ``jax.nn.elu`` guards its negative branch with an inner ``where(x > 0, 0, x)``
    so that *autodiff* of ``expm1`` cannot produce inf*0 NaNs; on TPU v5e that
    guard showed up as standalone ~0.7 ms kLoop select fusions in the op profile
    (2026-08-18).  The custom JVP supplies the NaN-free derivative
    ``where(x > 0, 1, exp(min(x, 0)))`` directly, so neither forward nor backward
    needs the guard.  Composed-step A/B (bf16_full, batch 420, same-session
    control): 41.5k vs 41.2k patches/s — ~neutral (+0.7%, within noise; XLA was
    already hiding most of the select cost), kept for the smaller HLO
    (cost_analysis flops 621.7 vs 627.3 GFLOP/step) and exact parity."""
    return jnp.where(x > 0, x, jnp.expm1(x))


@elu.defjvp
def _elu_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    # exp(min(x, 0)) keeps the untaken positive lanes finite (debug_nans-clean);
    # the tangent expression stays linear in t so reverse mode transposes exactly.
    return elu(x), jnp.where(x > 0, t, jnp.exp(jnp.minimum(x, 0.0)) * t)


if os.environ.get("LSHM_CUSTOM_ELU", "1") == "0":   # A/B escape hatch (bench subprocs)
    elu = jax.nn.elu  # noqa: F811


# ----------------------------------------------------------------------------------
# fast exact rewrites of the 1D AE's stride-4 convolutions (TPU)
#
# Both stages of the 1D AEs use kernel=4, stride=4 ops (reference:
# src/lofar_models.py:113-142).  Because the stride equals the kernel size, a
# "pack-by-4" view of the sequence — [N, L, C] -> [N, L/4, 4C], which is a pure
# reshape (layout-preserving, zero-copy) — turns them into stride-1 ops with 4x
# the channels, a shape the TPU handles far better than thin stride-4 windows:
#
# * encoder conv (pad (1,1)): out[j] = sum_d x[4j-1+d] w[d] touches packed cells
#   j-1 (sub-position 3) and j (sub-positions 0..2)  ==  a k=2, s=1 conv over the
#   packed view with a (2, 4C, F) kernel holding each tap once.  Measured on v5e
#   (batch 420, conv0): input-grad 382 -> ~50 us, weight-grad 464 -> 286 us, but
#   FORWARD 223 -> 353 us (the packed kernel doubles the tap count).  So the
#   rewrite is applied to the BACKWARD only, via custom_vjp: forward stays the
#   native stride-4 conv, the backward differentiates the packed equivalent.
#   Exact same math (the packed conv is tap-for-tap identical).
#
# * decoder ConvTranspose (lhs_dilation=4, pad (3,3)): the windows do not
#   overlap, so each output position takes exactly ONE tap:
#   out[4i+a] = x[i] @ w[3-a] — the whole op is a Dense layer to 4F channels
#   followed by a free reshape.  No conv machinery, no `reverse` ops in the
#   backward, and the weight-grad is a plain matmul contraction.
#
# STATUS: DOCUMENTED NEGATIVE RESULT — kept parity-tested but DEFAULT OFF
# (ModelConfig.fast_conv1d).  In the full flagship step (bf16_full, batch 420,
# 2026-08-17) the standalone wins did not compose: packed-bwd convs 39.0k vs
# 41.0k patches/s baseline, Dense-tconv 28.8k (matmul form) / 30.5k (einsum
# form), both together 28.4k.  The custom_vjp is a fusion boundary, and XLA's
# native conv emitter handles these thin shapes better than dot_general once
# the surrounding bias/ELU/cotangent fusions are in play.  The record matters:
# this is the "obvious" layout trick for k=s convs, and it loses here.
# ----------------------------------------------------------------------------------


def _pack_kernel_s4(w: jnp.ndarray) -> jnp.ndarray:
    """(4, C, F) stride-4 kernel -> its (2, 4C, F) packed-view equivalent.

    Tap d sits at sequence position 4j-1+d = 4(j+q)+a with (q, a) = divmod(d-1, 4),
    i.e. packed cell offset q+1 (of the k=2 window), sub-position a."""
    k, c, f = w.shape
    wp = jnp.zeros((2, 4 * c, f), w.dtype)
    for d in range(4):
        q, a = divmod(d - 1, 4)
        wp = wp.at[q + 1, a * c:(a + 1) * c, :].set(w[d])
    return wp


_DN_1D = ("NWC", "WIO", "NWC")


@jax.custom_vjp
def conv1d_s4(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """kernel=4, stride=4, padding=(1,1) 1D conv (torch Conv1d(k=4,s=4,p=1)
    geometry) with a packed-view backward (see module comment).

    Requires the sequence length to be a multiple of 4: the backward reshapes x to
    its packed [N, L/4, 4C] view (the forward alone would accept any L >= 2, but a
    silent forward + backward crash is worse than failing here)."""
    if x.shape[1] % 4:
        raise ValueError(
            f"conv1d_s4 needs a length divisible by 4 for its packed-view backward; "
            f"got L={x.shape[1]}"
        )
    return lax.conv_general_dilated(x, w, (4,), ((1, 1),), dimension_numbers=_DN_1D)


def _conv1d_s4_fwd(x, w):
    return conv1d_s4(x, w), (x, w)


def _conv1d_s4_bwd(res, ct):
    x, w = res
    n, L, c = x.shape

    def packed(xp, wp):
        return lax.conv_general_dilated(
            xp, wp, (1,), ((1, 0),), dimension_numbers=_DN_1D
        )

    _, vjp = jax.vjp(packed, x.reshape(n, L // 4, 4 * c), _pack_kernel_s4(w))
    dxp, dwp = vjp(ct)
    dw = jnp.stack(
        [dwp[(d - 1) // 4 + 1, ((d - 1) % 4) * c:((d - 1) % 4 + 1) * c, :]
         for d in range(4)], axis=0,
    )
    return dxp.reshape(n, L, c), dw


conv1d_s4.defvjp(_conv1d_s4_fwd, _conv1d_s4_bwd)


def convt1d_s4(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose1d(k=4, s=4, p=0) as Dense + free reshape: out[4i+a] = x[i] @ w[3-a]
    (w is the flax ConvTranspose (4, C, F) kernel; parity-tested vs nn.ConvTranspose).

    Formulated as ONE [C, 4F] matmul so no intermediate with a tiny trailing dim is
    materialized; the (N, L, 4F) -> (N, 4L, F) reshape is layout-preserving."""
    n, L, c = x.shape
    f = w.shape[-1]
    wm = w[::-1].transpose(1, 0, 2).reshape(c, 4 * f)
    return (x @ wm).reshape(n, L * 4, f)


class FastConv1dS4(nn.Module):
    """Drop-in for ``nn.Conv(features, (4,), strides=(4,), padding=((1,1),))`` with
    the packed-view backward.  Identical param tree (kernel/bias, same shapes and
    default inits), so checkpoints and the torch importer are unaffected."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return conv1d_s4(_cast(x, self.dtype), _cast(kernel, self.dtype)) \
            + _cast(bias, self.dtype)


class FastConvT1dS4(nn.Module):
    """Drop-in for ``nn.ConvTranspose(features, (4,), strides=(4,), padding=((3,3),))``
    computed as Dense + free reshape (non-overlapping windows). Identical param tree."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return convt1d_s4(_cast(x, self.dtype), _cast(kernel, self.dtype)) \
            + _cast(bias, self.dtype)


# ----------------------------------------------------------------------------------
# space-to-depth packed rewrites of the 2D stride-2 convolutions (TPU)
#
# The 2D AE's conv ladder starts at 4-8 channels (reference: src/lofar_models.py:31-41)
# — on the 128-lane MXU/VPU a channels-last conv with C=4 uses 4/128 lanes for every
# input tile it streams.  Both stage shapes here are *perfectly aligned* for 2x2
# space-to-depth packing (unlike the 1D k=s=4, p=1 case, where packing doubles the
# tap count — see the negative result above):
#
# * encoder Conv(k=4, s=2, p=1): with the input padded by 1, output (i, j) reads
#   padded rows 2i..2i+3 = exactly two 2-row blocks -> a k=2, s=1 VALID conv over the
#   [H/2+1, W/2+1, 4C] packed view.  Same 64 taps per (c, f), zero extra FLOPs,
#   4x the lane occupancy.
# * decoder ConvTranspose(k=4, s=2, p=1 torch geometry): the four output phases
#   (a, b) in {0,1}^2 are each a k=2 conv of the input — one k=2, s=1 VALID conv over
#   the padded input producing 4F phase-packed channels, then a shifted
#   depth-to-space gather out[2i+a, 2j+b, f] = y[i+a, j+b, (a,b,f)].  Again
#   tap-for-tap identical.
#
# No custom_vjp anywhere: the rewrite changes the forward expression itself, so XLA
# differentiates the packed ops natively (stride-1 gradients, no window dilation) and
# keeps fusing across them.  The s2d/d2s transposes are elementwise-bandwidth copies
# at the layer's own resolution; under the unrolled ADMM loop the input-side s2d is
# iteration-invariant and CSE'd to once per step.
#
# STATUS: DOCUMENTED NEGATIVE RESULT — kept parity-tested but DEFAULT OFF
# (ModelConfig.packed_conv2d = 0).  Composed flagship step on TPU v5e
# (2026-08-18, bf16_full, batch 420, two-point timing, same-session control;
# benchmarks/packed_conv2d_report.json): depth 0 = 41.3k patches/s, depth 1 =
# 36.5k, depth 2 = 36.0k, depth 3 = 35.8k — a uniform ~12-13% regression.  Even
# with zero tap duplication and no custom_vjp boundary, the s2d/d2s
# reshape-transposes break XLA's conv/ELU/cotangent fusion chains and cost more
# than the 4x lane occupancy wins back.  Third composed-step loss for a layout
# rewrite in this model (grouped 1D fusion, packed-view 1D backward, now 2D s2d):
# XLA's native thin-channel conv lowering on this hardware is simply good.
# ----------------------------------------------------------------------------------


def conv2d_s2_packed(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Conv2d(k=4, s=2, p=1) on NHWC ``x`` with HWIO kernel ``w`` via 2x2
    space-to-depth: exact same math as the strided conv (parity-tested)."""
    n, h, ww, c = x.shape
    f = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # [N, H+2, W+2, C] -> [N, (H+2)/2, (W+2)/2, 4C]; packed channel = (a*2 + b)*C + c
    xp = xp.reshape(n, (h + 2) // 2, 2, (ww + 2) // 2, 2, c)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(n, (h + 2) // 2, (ww + 2) // 2, 4 * c)
    # kernel [4,4,C,F] -> [2,2,4C,F]: wp[p,q,(a,b,c),f] = w[2p+a, 2q+b, c, f]
    wp = w.reshape(2, 2, 2, 2, c, f).transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * c, f)
    return lax.conv_general_dilated(
        xp, wp, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def convt2d_s2_packed(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose2d(k=4, s=2, p=1 torch geometry; flax ConvTranspose((4,4),
    strides=(2,2), padding=((2,2),(2,2))) semantics, kernel unflipped) via phase
    packing: one k=2, s=1 VALID conv emitting all four output phases as channels,
    then a shifted depth-to-space.  Exact same math (parity-tested)."""
    n, h, ww, c = x.shape
    f = w.shape[-1]
    # out[2i+a, 2j+b, f] = sum_{p,q} w[2p+a, 2q+b] . xpad[i+p, j+q]  (xpad = pad 1)
    wy = w.reshape(2, 2, 2, 2, c, f).transpose(0, 2, 4, 1, 3, 5).reshape(2, 2, c, 4 * f)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp, wy, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )                                                     # [N, h+1, w+1, 4F]
    rows = []
    for a in (0, 1):
        cols = [y[:, a:a + h, b:b + ww, (2 * a + b) * f:(2 * a + b + 1) * f]
                for b in (0, 1)]
        rows.append(jnp.stack(cols, axis=3))              # [N, h, w, 2, F]
    z = jnp.stack(rows, axis=2)                           # [N, h, 2, w, 2, F]
    return z.reshape(n, 2 * h, 2 * ww, f)


class PackedConv2dS2(nn.Module):
    """Drop-in for ``nn.Conv(features, (4,4), strides=(2,2), padding=((1,1),(1,1)))``
    computed space-to-depth packed.  Identical param tree (kernel/bias, same shapes
    and default inits), so checkpoints and the torch importer are unaffected."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, 4, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return conv2d_s2_packed(_cast(x, self.dtype), _cast(kernel, self.dtype)) \
            + _cast(bias, self.dtype)


class PackedConvT2dS2(nn.Module):
    """Drop-in for ``nn.ConvTranspose(features, (4,4), strides=(2,2),
    padding=((2,2),(2,2)))`` computed phase-packed.  Identical param tree."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, 4, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return convt2d_s2_packed(_cast(x, self.dtype), _cast(kernel, self.dtype)) \
            + _cast(bias, self.dtype)


def uv_harmonic_features(uv: jnp.ndarray, scales: Sequence[float]) -> jnp.ndarray:
    """Kron-harmonic embedding of (u, v): [N, 2] -> [N, 4 * len(scales)].

    k[:, 2h:2h+2] = scales[h] * uv; output = concat(sin(k), cos(k))
    (reference: src/lofar_models.py:60-62).
    """
    s = jnp.asarray(scales, dtype=uv.dtype)            # [H]
    k = (s[None, :, None] * uv[:, None, :]).reshape(uv.shape[0], -1)  # [N, 2H]
    return jnp.concatenate([jnp.sin(k), jnp.cos(k)], axis=-1)          # [N, 4H]


class AutoEncoder2D(nn.Module):
    """2D conv AE on [N, P, P, C] patches (P = 64 * 2 = 128 nominal; any P that is a
    multiple of 64 works since 6 stride-2 stages reduce P -> P/64 = 2)."""

    latent_dim: int = 224
    channels: int = 4
    harmonic_scales: Sequence[float] = (1e-4, 1e-3, 1e-2, 1e-1)
    rica: bool = True
    dtype: jnp.dtype = jnp.float32
    # number of outermost (full-resolution) conv stages computed space-to-depth
    # packed: encoder conv0..conv{packed-1} and decoder tconv{6-packed}..tconv5.
    # Exact math, identical param tree (see conv2d_s2_packed above).
    packed: int = 0
    # run the two outermost encoder stages (conv0 + ELU + conv1 + ELU) as ONE fused
    # Pallas VMEM kernel with a rematerializing custom VJP
    # (lshm_tpu/kernels/conv2d_outer.py).  Identical param tree; parity-tested
    # against the XLA stages.  Interpret-mode off-TPU keeps CPU tests hermetic.
    pallas_head: bool = False

    @property
    def harmonic_dim(self) -> int:
        return len(self.harmonic_scales) * 4

    def setup(self):
        nconv = len(CHANNEL_LADDER)
        conv = lambda i, f, name: (
            PackedConv2dS2(f, name=name, dtype=self.dtype) if i < self.packed
            else nn.Conv(
                f, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), name=name,
                dtype=self.dtype,
            )
        )
        # lax.conv_transpose pads the *dilated* input: pad = k - 1 - p_equivalent,
        # so (2, 2) here gives out = 2 * in (torch ConvTranspose2d(4, s=2, p=1) geometry)
        tconv = lambda i, f, name: (
            PackedConvT2dS2(f, name=name, dtype=self.dtype)
            if i >= nconv - self.packed
            else nn.ConvTranspose(
                f, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)), name=name,
                dtype=self.dtype,
            )
        )
        self.enc = [conv(i, f, f"conv{i}") for i, f in enumerate(CHANNEL_LADDER)]
        dec_ladder = CHANNEL_LADDER[-2::-1] + (self.channels,)
        self.dec = [tconv(i, f, f"tconv{i}") for i, f in enumerate(dec_ladder)]
        self.fcuv1 = nn.Dense(self.harmonic_dim, dtype=self.dtype)
        self.fcuv3 = nn.Dense(self.harmonic_dim, dtype=self.dtype)
        self.fc1 = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fc3 = nn.Dense(BOTTLENECK, dtype=self.dtype)
        if self.rica:
            self.fc2in = nn.Dense(self.latent_dim, dtype=self.dtype)
            self.fc2out = nn.Dense(self.latent_dim, dtype=self.dtype)

    def encode(self, x: jnp.ndarray, uvf: jnp.ndarray) -> jnp.ndarray:
        stages = self.enc
        if self.pallas_head and not self.is_initializing():
            # fused VMEM kernel for the two full-resolution stages; params are read
            # from the same nn.Conv submodules (identical tree, same as the fuse_1d
            # pattern in cascade.py), so checkpoints/importers are unaffected
            from lshm_tpu.kernels.conv2d_outer import enc_head

            p0 = self.enc[0].variables["params"]
            p1 = self.enc[1].variables["params"]
            cast = lambda a: a.astype(self.dtype)
            x = enc_head(cast(x), cast(p0["kernel"]), cast(p0["bias"]),
                         cast(p1["kernel"]), cast(p1["bias"]))
            stages = self.enc[2:]
        for c in stages:
            x = elu(c(x))
        x = x.reshape(x.shape[0], -1)                       # [N, 768] (h, w, c order)
        u = elu(self.fcuv1(uvf))
        return elu(self.fc1(jnp.concatenate([x, u], axis=-1)))

    def decode(self, z: jnp.ndarray, uvf: jnp.ndarray) -> jnp.ndarray:
        u = elu(self.fcuv3(uvf))
        x = self.fc3(jnp.concatenate([z, u], axis=-1))      # no activation (ref :91)
        x = x.reshape(x.shape[0], 2, 2, CHANNEL_LADDER[-1])
        for t in self.dec[:-1]:
            x = elu(t(x))
        return self.dec[-1](x)                              # linear output stage

    def __call__(self, x: jnp.ndarray, uv: jnp.ndarray):
        """Returns (reconstruction, latent).  With RICA the returned latent is the sparse
        intermediate (elu(fc2in(mu))), and decode sees elu(fc2out(sparse))."""
        uvf = uv_harmonic_features(uv, self.harmonic_scales)
        mu = self.encode(x, uvf)
        if not self.rica:
            return self.decode(mu, uvf), mu
        mu = elu(self.fc2in(mu))
        muprime = elu(self.fc2out(mu))
        return self.decode(muprime, uvf), mu


def _cast(a, dtype):
    return a.astype(dtype) if dtype is not None and a.dtype != dtype else a


def _dense(p, x, dtype):
    return _cast(x, dtype) @ _cast(p["kernel"], dtype) + _cast(p["bias"], dtype)


def _grouped_conv1d(h, pT, pF, dtype, *, stride=None, lhs_dilation=None, pad):
    """One layer of TWO parallel 1D convs as a single grouped conv.

    ``h`` is [N, L, 2C] with channel blocks [T | F]; kernels/biases concatenate along
    the output-feature axis, ``feature_group_count=2`` routes block T through kT and
    block F through kF — bit-for-bit the same math as two separate convs, but the op
    count halves and the channel (lane) dimension doubles, which matters on the
    128-lane TPU MXU/VPU with this model's thin channel ladder."""
    k = jnp.concatenate([_cast(pT["kernel"], dtype), _cast(pF["kernel"], dtype)],
                        axis=-1)
    b = jnp.concatenate([_cast(pT["bias"], dtype), _cast(pF["bias"], dtype)])
    y = lax.conv_general_dilated(
        _cast(h, dtype), k,
        window_strides=(stride,) if stride else (1,),
        padding=(pad,),
        lhs_dilation=(lhs_dilation,) if lhs_dilation else None,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=2,
    )
    return y + b


def fused_dual_ae1d(paramsT, paramsF, sT, sF, uvf, *, rica: bool, dtype=jnp.float32):
    """Run two identical-topology ``AutoEncoder1D`` instances (time-major and
    freq-major; reference: src/lofar_models.py:103-184 used twice at
    src/kharmonic_lofar.py:61-65) as ONE grouped-conv stack.

    ``paramsT``/``paramsF`` are each AE's flax param subtree (``conv0..5``,
    ``tconv0..5``, ``fcuv1/fc1/fc3/fcuv3`` [, ``fc2in/fc2out``]); ``sT``/``sF`` the
    [N, L, C] vectorized inputs; ``uvf`` the shared uv-harmonic embedding.  Exactly
    equivalent to ``aeT(sT), aeF(sF)`` (parity-tested); returns
    ``((yT, muT), (yF, muF))``."""
    n = sT.shape[0]
    nconv = len(CHANNEL_LADDER)
    h = jnp.concatenate([_cast(sT, dtype), _cast(sF, dtype)], axis=-1)
    for i in range(nconv):
        h = elu(_grouped_conv1d(h, paramsT[f"conv{i}"], paramsF[f"conv{i}"],
                                dtype, stride=4, pad=(1, 1)))
    top = CHANNEL_LADDER[-1]
    flatT = h[..., :top].reshape(n, -1)          # [N, 768], position-major like flax
    flatF = h[..., top:].reshape(n, -1)

    def encode_head(p, flat):
        u = elu(_dense(p["fcuv1"], uvf, dtype))
        return elu(_dense(p["fc1"], jnp.concatenate([flat, u], axis=-1), dtype))

    muT = encode_head(paramsT, flatT)
    muF = encode_head(paramsF, flatF)

    def sparse_and_z(p, mu):
        if not rica:
            return mu, mu
        sparse = elu(_dense(p["fc2in"], mu, dtype))
        return sparse, elu(_dense(p["fc2out"], sparse, dtype))

    muT, zT = sparse_and_z(paramsT, muT)
    muF, zF = sparse_and_z(paramsF, muF)

    def decode_head(p, z):
        u = elu(_dense(p["fcuv3"], uvf, dtype))
        x = _dense(p["fc3"], jnp.concatenate([z, u], axis=-1), dtype)
        return x.reshape(n, BOTTLENECK // top, top)          # [N, 4, 192]

    h = jnp.concatenate([decode_head(paramsT, zT), decode_head(paramsF, zF)], axis=-1)
    for i in range(nconv - 1):
        h = elu(_grouped_conv1d(h, paramsT[f"tconv{i}"], paramsF[f"tconv{i}"],
                                dtype, lhs_dilation=4, pad=(3, 3)))
    h = _grouped_conv1d(h, paramsT[f"tconv{nconv - 1}"], paramsF[f"tconv{nconv - 1}"],
                        dtype, lhs_dilation=4, pad=(3, 3))   # linear output stage
    C = sT.shape[-1]
    return (h[..., :C], muT), (h[..., C:], muF)


class AutoEncoder1D(nn.Module):
    """1D conv AE on the vectorized patch [N, P*P, C]; 6 stride-4 stages reduce
    16384 -> 4 (reference: src/lofar_models.py:103-184)."""

    latent_dim: int = 16
    channels: int = 4
    harmonic_scales: Sequence[float] = (1e-4, 1e-3, 1e-2, 1e-1)
    rica: bool = True
    dtype: jnp.dtype = jnp.float32
    # exact rewrites of the stride-4 ops (packed-view backward conv +
    # Dense-as-ConvTranspose); same param tree, parity-tested — see module comment.
    # Default OFF: measured in-graph NEGATIVE on TPU v5e (ModelConfig.fast_conv1d)
    fast: bool = False

    @property
    def harmonic_dim(self) -> int:
        return len(self.harmonic_scales) * 4

    def setup(self):
        if self.fast:
            conv = lambda f, name: FastConv1dS4(f, name=name, dtype=self.dtype)
            tconv = lambda f, name: FastConvT1dS4(f, name=name, dtype=self.dtype)
        else:
            conv = lambda f, name: nn.Conv(
                f, (4,), strides=(4,), padding=((1, 1),), name=name, dtype=self.dtype
            )
            # decoder: out = 4 * in (torch ConvTranspose1d(4, s=4, p=0) geometry);
            # dilated-input padding = k - 1 - 0 = 3 per side
            tconv = lambda f, name: nn.ConvTranspose(
                f, (4,), strides=(4,), padding=((3, 3),), name=name, dtype=self.dtype
            )
        self.enc = [conv(f, f"conv{i}") for i, f in enumerate(CHANNEL_LADDER)]
        dec_ladder = CHANNEL_LADDER[-2::-1] + (self.channels,)
        self.dec = [tconv(f, f"tconv{i}") for i, f in enumerate(dec_ladder)]
        self.fcuv1 = nn.Dense(self.harmonic_dim, dtype=self.dtype)
        self.fcuv3 = nn.Dense(self.harmonic_dim, dtype=self.dtype)
        self.fc1 = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fc3 = nn.Dense(BOTTLENECK, dtype=self.dtype)
        if self.rica:
            self.fc2in = nn.Dense(self.latent_dim, dtype=self.dtype)
            self.fc2out = nn.Dense(self.latent_dim, dtype=self.dtype)

    def encode(self, x: jnp.ndarray, uvf: jnp.ndarray) -> jnp.ndarray:
        for c in self.enc:
            x = elu(c(x))
        x = x.reshape(x.shape[0], -1)                       # [N, 768]
        u = elu(self.fcuv1(uvf))
        return elu(self.fc1(jnp.concatenate([x, u], axis=-1)))

    def decode(self, z: jnp.ndarray, uvf: jnp.ndarray) -> jnp.ndarray:
        u = elu(self.fcuv3(uvf))
        x = self.fc3(jnp.concatenate([z, u], axis=-1))
        x = x.reshape(x.shape[0], 4, CHANNEL_LADDER[-1])    # 2^2 = 4 positions
        for t in self.dec[:-1]:
            x = elu(t(x))
        return self.dec[-1](x)

    def __call__(self, x: jnp.ndarray, uv: jnp.ndarray):
        uvf = uv_harmonic_features(uv, self.harmonic_scales)
        mu = self.encode(x, uvf)
        if not self.rica:
            return self.decode(mu, uvf), mu
        mu = elu(self.fc2in(mu))
        muprime = elu(self.fc2out(mu))
        return self.decode(muprime, uvf), mu
