"""The cascaded autoencoder trio + clustering head as one Flax module.

Current pipeline (reference: src/kharmonic_lofar.py:132-159):
    x1, mu = AE2D(x, uv)
    x11    = (x - x1) / 2                       # halved residual
    x2     = AE1D_T(vec(x11), uv)               # time-major vectorization
    x3     = AE1D_F(vec(x11^T), uv)^T           # freq-major vectorization
    xrecon = x1 + x2 + x3
    Mu     = concat(mu, muT, muF)               # clustering feature

Legacy Fourier pipeline (reference: Demo.ipynb cells 6 & 10, src/EvaluateClusters.ipynb):
    x1, mu = AE2D(x, uv)
    xf     = fftshift(fft2(x - x1, norm="ortho"))       # FULL residual
    yf     = clamp(concat(Re xf, Im xf), -10, 10)       # 2C channels, stability clamp
    yhat, ymu = AE2D_F(yf, uv)                  # second 2D AE in Fourier space
    Mu     = concat(mu, ymu)

Both variants share the KHM head and the ADMM/augmented objective; which one runs is
config (`ModelConfig.fourier_variant`).
"""

from __future__ import annotations

from dataclasses import field
import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from lshm_tpu.config import ModelConfig
from lshm_tpu.models.autoencoders import AutoEncoder1D, AutoEncoder2D
from lshm_tpu.models.khm import KHarmonicMeans


@struct.dataclass
class CascadeOutputs:
    """Everything the objective and the ADMM dual update need from one forward pass."""

    x1: jnp.ndarray            # 2D AE reconstruction          [N, P, P, C]
    x11: jnp.ndarray           # halved residual (x - x1) / 2  [N, P, P, C]
    x2: jnp.ndarray            # time-axis 1D AE recon         [N, P, P, C]
    x3: jnp.ndarray            # freq-axis 1D AE recon         [N, P, P, C]
    xrecon: jnp.ndarray        # x1 + x2 + x3                  [N, P, P, C]
    Mu: jnp.ndarray            # concat latent                 [N, L + 2*Lt]
    mu: jnp.ndarray            # 2D latent                     [N, L]
    muT: jnp.ndarray           # time-axis 1D latent           [N, Lt]
    muF: jnp.ndarray           # freq-axis 1D latent           [N, Lt]
    # legacy Fourier variant extras (zeros-shaped placeholders otherwise)
    yf_in: jnp.ndarray | None = None   # Fourier-space AE input  [N, P, P, 2C]
    yf_out: jnp.ndarray | None = None  # Fourier-space AE recon  [N, P, P, 2C]


def _dft_mats(n: int, dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) parts of the orthonormal n-point DFT matrix F = (C + iS)/1,
    F[j,k] = exp(-2*pi*i*j*k/n)/sqrt(n).  F is symmetric."""
    k = jnp.arange(n, dtype=jnp.int32)
    # reduce j*k mod n in exact integer arithmetic BEFORE the trig: angles stay in
    # [0, 2*pi), so f32 cos/sin keep full precision (raw angles reach ~800 rad at
    # n=128 and lose ~4 digits to argument reduction)
    m = (jnp.outer(k, k) % n).astype(dtype)
    ang = (-2.0 * jnp.pi / n) * m
    s = 1.0 / jnp.sqrt(jnp.asarray(n, dtype))
    return jnp.cos(ang) * s, jnp.sin(ang) * s


def fft2_shifted(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal 2D FFT over the spatial dims of NHWC + fftshift, returned as
    real/imag channel pairs [N, P, P, 2C] (reference: src/lofar_tools.py:24-30 and the
    notebooks' torch.fft.fftn(dim=(2,3), norm='ortho')).

    Computed as dense DFT matmuls rather than the FFT HLO: at the fixed P=128 patch
    size the transform is six [P, P] x [P, N*P*C] f32 matmuls — an MXU-native shape
    that fuses with the surrounding cascade, differentiates as matmuls, and avoids the
    FFT op entirely (numerically verified against jnp.fft in tests)."""
    n, h, w, c = x.shape
    hp = jax.lax.Precision.HIGHEST           # keep f32 accumulation on the MXU
    Ch, Sh = _dft_mats(h, x.dtype)
    Cw, Sw = _dft_mats(w, x.dtype)
    # axis 1 (h): y = F_h @ x (x real)
    yre = jnp.einsum("hk,nkwc->nhwc", Ch, x, precision=hp)
    yim = jnp.einsum("hk,nkwc->nhwc", Sh, x, precision=hp)
    # axis 2 (w): z = y @ F_w (F symmetric)
    zre = (jnp.einsum("nhkc,kw->nhwc", yre, Cw, precision=hp)
           - jnp.einsum("nhkc,kw->nhwc", yim, Sw, precision=hp))
    zim = (jnp.einsum("nhkc,kw->nhwc", yre, Sw, precision=hp)
           + jnp.einsum("nhkc,kw->nhwc", yim, Cw, precision=hp))
    # fftshift = roll by n//2 on both spatial dims (reference: src/lofar_tools.py:24-30)
    zre = jnp.roll(zre, (h // 2, w // 2), axis=(1, 2))
    zim = jnp.roll(zim, (h // 2, w // 2), axis=(1, 2))
    return jnp.concatenate([zre, zim], axis=-1)


class CascadedAE(nn.Module):
    """Flagship model: AE2D + (AE1D_T, AE1D_F | AE2D_Fourier) + KHM head."""

    cfg: ModelConfig = field(default_factory=ModelConfig)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.compute_dtype.startswith("bfloat16") else self.dtype
        ch = c.num_channels
        self.ae2d = AutoEncoder2D(
            latent_dim=c.latent_dim,
            channels=ch,
            harmonic_scales=c.harmonic_scales,
            rica=c.rica,
            dtype=dtype,
            packed=c.packed_conv2d,
            pallas_head=c.pallas_head,
            name="ae2d",
        )
        if c.fourier_variant:
            self.aef = AutoEncoder2D(
                latent_dim=c.latent_dim_fourier,
                channels=2 * ch,                  # real+imag stacked FFT channels
                harmonic_scales=c.harmonic_scales,
                rica=c.rica,
                dtype=dtype,
                packed=c.packed_conv2d,
                name="aef",
            )
        else:
            self.aeT = AutoEncoder1D(
                latent_dim=c.latent_dim_1d,
                channels=ch,
                harmonic_scales=c.harmonic_scales,
                rica=c.rica,
                dtype=dtype,
                fast=c.fast_conv1d,
                name="aeT",
            )
            self.aeF = AutoEncoder1D(
                latent_dim=c.latent_dim_1d,
                channels=ch,
                harmonic_scales=c.harmonic_scales,
                rica=c.rica,
                dtype=dtype,
                fast=c.fast_conv1d,
                name="aeF",
            )
        self.khm = KHarmonicMeans(
            latent_dim=c.total_latent_dim,
            num_clusters=c.num_clusters,
            order=c.khm_order,
            name="khm",
        )

    def __call__(self, x: jnp.ndarray, uv: jnp.ndarray) -> CascadeOutputs:
        n, h, w, ch = x.shape
        _ = self.khm.M  # touch so init registers the centroids (losses read them directly)
        f32 = lambda a: a.astype(x.dtype)  # loss math stays f32 even under bf16 compute
        x1, mu = self.ae2d(x, uv)
        x1, mu = f32(x1), f32(mu)
        x11 = (x - x1) * 0.5

        if self.cfg.fourier_variant:
            # full residual + the notebooks' stability clamp on the FFT features
            yf_in = jnp.clip(fft2_shifted(x - x1), -10.0, 10.0)
            yf_out, ymu = self.aef(yf_in, uv)
            yf_out, ymu = f32(yf_out), f32(ymu)
            zero = jnp.zeros_like(x)
            return CascadeOutputs(
                x1=x1, x11=x11, x2=zero, x3=zero, xrecon=x1,
                Mu=jnp.concatenate([mu, ymu], axis=-1),
                mu=mu, muT=ymu, muF=ymu[:, :0],
                yf_in=yf_in, yf_out=yf_out,
            )

        # time-major vectorization: NHWC -> [N, H*W, C]
        iy1 = x11.reshape(n, h * w, ch)
        # freq-major vectorization: transpose spatial dims first
        iy2 = jnp.swapaxes(x11, 1, 2).reshape(n, w * h, ch)

        if self.cfg.fuse_1d and not self.is_initializing():
            # both 1D AEs as ONE grouped-conv stack (exact math; see
            # autoencoders.fused_dual_ae1d).  Init still runs the plain calls below
            # so the param tree is identical with or without fusion.
            from lshm_tpu.models.autoencoders import (
                fused_dual_ae1d,
                uv_harmonic_features,
            )

            dtype = (jnp.bfloat16 if self.cfg.compute_dtype.startswith("bfloat16")
                     else self.dtype)
            uvf = uv_harmonic_features(uv, self.cfg.harmonic_scales)
            (yyT, muT), (yyF, muF) = fused_dual_ae1d(
                self.aeT.variables["params"], self.aeF.variables["params"],
                iy1, iy2, uvf, rica=self.cfg.rica, dtype=dtype,
            )
        else:
            yyT, muT = self.aeT(iy1, uv)
            yyF, muF = self.aeF(iy2, uv)

        yyT, muT = f32(yyT), f32(muT)
        x2 = yyT.reshape(n, h, w, ch)
        yyF, muF = f32(yyF), f32(muF)
        x3 = jnp.swapaxes(yyF.reshape(n, w, h, ch), 1, 2)

        xrecon = x1 + x2 + x3
        Mu = jnp.concatenate([mu, muT, muF], axis=-1)
        return CascadeOutputs(
            x1=x1, x11=x11, x2=x2, x3=x3, xrecon=xrecon,
            Mu=Mu, mu=mu, muT=muT, muF=muF,
        )

    # --- exposed subcomputations for eval / KHM losses -------------------------------
    def khm_loss(self, X: jnp.ndarray) -> jnp.ndarray:
        return self.khm.clustering_error(X)

    def khm_similarity(self) -> jnp.ndarray:
        return self.khm.cluster_similarity()

    def khm_distances(self, X: jnp.ndarray) -> jnp.ndarray:
        return self.khm.distances(X)

    def khm_assign(self, X: jnp.ndarray) -> jnp.ndarray:
        return self.khm.assign(X)
