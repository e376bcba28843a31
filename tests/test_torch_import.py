"""Full-model numerical parity: our Flax autoencoders with imported torch-layout weights
must reproduce a torch.nn.functional forward of the documented reference architecture
(reference topology: src/lofar_models.py:12-184) to float32 tolerance.

The torch oracle here is built from torch.nn.functional ops directly (library calls, not
reference code) following the architecture documented in SURVEY.md §2.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lshm_tpu.models import AutoEncoder1D, AutoEncoder2D  # noqa: E402
from lshm_tpu.utils.torch_import import convert_autoencoder, convert_khm  # noqa: E402

SCALES = (1e-4, 1e-3, 1e-2, 1e-1)
LADDER = (8, 12, 24, 48, 96, 192)


def make_torch_sd(rng, ndim, channels, latent, rica=True):
    """Random weights in the torch state_dict layout of the reference modules."""
    sd = {}
    cin = channels
    for i, cout in enumerate(LADDER):
        kshape = (cout, cin, 4, 4) if ndim == 2 else (cout, cin, 4)
        sd[f"conv{i}.weight"] = rng.normal(size=kshape, scale=0.2).astype(np.float32)
        sd[f"conv{i}.bias"] = rng.normal(size=cout, scale=0.1).astype(np.float32)
        cin = cout
    dec = list(LADDER[-2::-1]) + [channels]
    cin = LADDER[-1]
    for i, cout in enumerate(dec):
        kshape = (cin, cout, 4, 4) if ndim == 2 else (cin, cout, 4)
        sd[f"tconv{i}.weight"] = rng.normal(size=kshape, scale=0.2).astype(np.float32)
        sd[f"tconv{i}.bias"] = rng.normal(size=cout, scale=0.1).astype(np.float32)
        cin = cout
    H = len(SCALES) * 4
    for name, (o, i) in {
        "fcuv1": (H, H), "fcuv3": (H, H),
        "fc1": (latent, 768 + H), "fc3": (768, latent + H),
        **({"fc2in": (latent, latent), "fc2out": (latent, latent)} if rica else {}),
    }.items():
        sd[f"{name}.weight"] = rng.normal(size=(o, i), scale=0.05).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=o, scale=0.05).astype(np.float32)
    return sd


def torch_uvf(uv):
    s = torch.tensor(SCALES)
    k = torch.kron(s, uv)
    return torch.cat([torch.sin(k), torch.cos(k)], dim=1)


def torch_forward(sd, x, uv, ndim, rica=True):
    """torch.nn.functional oracle of the reference AE forward."""
    t = lambda n: torch.from_numpy(sd[n])
    uvf = torch_uvf(uv)
    h = x
    for i in range(6):
        if ndim == 2:
            h = F.elu(F.conv2d(h, t(f"conv{i}.weight"), t(f"conv{i}.bias"), stride=2, padding=1))
        else:
            h = F.elu(F.conv1d(h, t(f"conv{i}.weight"), t(f"conv{i}.bias"), stride=4, padding=1))
    h = torch.flatten(h, 1)
    u = F.elu(F.linear(uvf, t("fcuv1.weight"), t("fcuv1.bias")))
    mu = F.elu(F.linear(torch.cat([h, u], 1), t("fc1.weight"), t("fc1.bias")))
    if rica:
        mu = F.elu(F.linear(mu, t("fc2in.weight"), t("fc2in.bias")))
        z = F.elu(F.linear(mu, t("fc2out.weight"), t("fc2out.bias")))
    else:
        z = mu
    u3 = F.elu(F.linear(uvf, t("fcuv3.weight"), t("fcuv3.bias")))
    h = F.linear(torch.cat([z, u3], 1), t("fc3.weight"), t("fc3.bias"))
    h = h.reshape(-1, 192, 2, 2) if ndim == 2 else h.reshape(-1, 192, 4)
    for i in range(6):
        if ndim == 2:
            h2 = F.conv_transpose2d(h, t(f"tconv{i}.weight"), t(f"tconv{i}.bias"), stride=2, padding=1)
        else:
            h2 = F.conv_transpose1d(h, t(f"tconv{i}.weight"), t(f"tconv{i}.bias"), stride=4, padding=0)
        h = F.elu(h2) if i < 5 else h2
    return h, mu


def test_ae2d_parity_with_torch_oracle():
    rng = np.random.default_rng(0)
    sd = make_torch_sd(rng, 2, channels=4, latent=32)
    x = rng.normal(size=(2, 128, 128, 4), scale=0.5).astype(np.float32)
    uv = rng.normal(size=(2, 2)).astype(np.float32)

    want_recon, want_mu = torch_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2).copy()), torch.from_numpy(uv), 2
    )
    m = AutoEncoder2D(latent_dim=32, channels=4, harmonic_scales=SCALES, rica=True)
    params = {"params": convert_autoencoder(sd, 2, rica=True)}
    recon, mu = m.apply(params, jnp.asarray(x), jnp.asarray(uv))
    np.testing.assert_allclose(
        np.asarray(mu), want_mu.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(recon), want_recon.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=5e-4
    )


def test_ae1d_parity_with_torch_oracle():
    rng = np.random.default_rng(1)
    sd = make_torch_sd(rng, 1, channels=4, latent=16)
    x = rng.normal(size=(2, 128 * 128, 4), scale=0.5).astype(np.float32)
    uv = rng.normal(size=(2, 2)).astype(np.float32)

    want_recon, want_mu = torch_forward(
        sd, torch.from_numpy(x.transpose(0, 2, 1).copy()), torch.from_numpy(uv), 1
    )
    m = AutoEncoder1D(latent_dim=16, channels=4, harmonic_scales=SCALES, rica=True)
    params = {"params": convert_autoencoder(sd, 1, rica=True)}
    recon, mu = m.apply(params, jnp.asarray(x), jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(mu), want_mu.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(recon), want_recon.numpy().transpose(0, 2, 1), rtol=1e-3, atol=5e-4
    )


def test_khm_import():
    sd = {"M": np.arange(20, dtype=np.float32).reshape(4, 5)}
    out = convert_khm(sd)
    np.testing.assert_array_equal(out["M"], sd["M"])


def test_full_checkpoint_roundtrip(tmp_path):
    """Write torch-format .model files, import, and run the cascade forward."""
    from lshm_tpu.config import ModelConfig
    from lshm_tpu.models import CascadedAE
    from lshm_tpu.utils.torch_import import load_reference_checkpoints

    rng = np.random.default_rng(2)
    paths = {}
    for name, (ndim, latent) in {
        "net": (2, 32), "netT": (1, 8), "netF": (1, 8),
    }.items():
        sd = make_torch_sd(rng, ndim, channels=4, latent=latent)
        p = tmp_path / f"{name}.model"
        torch.save({"model_state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}}, p)
        paths[name] = str(p)
    M = rng.normal(size=(4, 32 + 16), scale=0.5).astype(np.float32)
    p = tmp_path / "khm.model"
    torch.save({"model_state_dict": {"M": torch.from_numpy(M)}}, p)
    paths["khm"] = str(p)

    params = load_reference_checkpoints(paths["net"], paths["netT"], paths["netF"], paths["khm"])
    cfg = ModelConfig(latent_dim=32, latent_dim_1d=8, num_clusters=4, rica=True)
    model = CascadedAE(cfg=cfg)
    x = jnp.asarray(rng.normal(size=(2, 128, 128, 4)).astype(np.float32))
    uv = jnp.asarray(rng.normal(size=(2, 2)).astype(np.float32))
    out = model.apply(params, x, uv)
    assert out.Mu.shape == (2, 48)
    assert np.all(np.isfinite(np.asarray(out.xrecon)))
