from lshm_tpu.models.autoencoders import (
    AutoEncoder2D,
    AutoEncoder1D,
    uv_harmonic_features,
)
from lshm_tpu.models.khm import KHarmonicMeans
from lshm_tpu.models.cascade import CascadedAE, CascadeOutputs, fft2_shifted

__all__ = [
    "AutoEncoder2D",
    "AutoEncoder1D",
    "uv_harmonic_features",
    "KHarmonicMeans",
    "CascadedAE",
    "CascadeOutputs",
    "fft2_shifted",
]
