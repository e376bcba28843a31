"""Legacy Fourier-pipeline parity: our ``fourier_variant`` cascade with imported
torch-layout weights must reproduce the notebook math VALUE-for-value —

    xhat, mu = net(x, uv)
    y  = clamp(fftshift(fft2(x - xhat, norm='ortho')) as [Re | Im] channels, +-10)
    yhat, ymu = fnet(y, uv)
    Mu = concat(mu, ymu)

(reference: Demo.ipynb cells 6 & 10, src/EvaluateClusters.ipynb cells 8 & 18, with the
current reference module signatures) — plus the specified full-residual ADMM semantics
of the variant (the notebooks are inference-only; see README deviations)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lshm_tpu.config import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig  # noqa: E402
from lshm_tpu.models import CascadedAE  # noqa: E402
from lshm_tpu.utils.torch_import import convert_autoencoder  # noqa: E402
from tests.test_torch_import import SCALES, make_torch_sd, torch_forward  # noqa: E402

L, LF, KC = 32, 16, 4


def _fourier_setup(seed=0, n=2):
    rng = np.random.default_rng(seed)
    sd_net = make_torch_sd(rng, 2, channels=4, latent=L)
    sd_fnet = make_torch_sd(rng, 2, channels=8, latent=LF)
    M = rng.normal(size=(KC, L + LF), scale=0.5).astype(np.float32)
    x = rng.normal(size=(n, 128, 128, 4), scale=0.5).astype(np.float32)
    uv = rng.normal(size=(n, 2)).astype(np.float32)

    cfg = ModelConfig(latent_dim=L, latent_dim_1d=8, latent_dim_fourier=LF,
                      num_clusters=KC, rica=True, fourier_variant=True)
    model = CascadedAE(cfg=cfg)
    params = {"params": {
        "ae2d": convert_autoencoder(sd_net, 2, rica=True),
        "aef": convert_autoencoder(sd_fnet, 2, rica=True),
        "khm": {"M": M},
    }}
    return model, params, sd_net, sd_fnet, x, uv


def torch_fourier_pipeline(sd_net, sd_fnet, x_nchw, uv):
    """The notebook forward, channel-first (Demo.ipynb cell 10)."""
    xhat, mu = torch_forward(sd_net, x_nchw, uv, 2)
    fftx = torch.fft.fftn(x_nchw - xhat, dim=(2, 3), norm="ortho")
    fftx = torch.fft.fftshift(fftx, dim=(2, 3))
    y = torch.cat((fftx.real, fftx.imag), 1).clamp(min=-10, max=10)
    yhat, ymu = torch_forward(sd_fnet, y, uv, 2)
    return y, yhat, torch.cat((mu, ymu), 1)


def test_dft_matmul_matches_fft():
    """fft2_shifted computes the orthonormal FFT as MXU matmuls (no FFT HLO); it must
    match jnp.fft to f32 tolerance on both spatial axes incl. the fftshift."""
    from lshm_tpu.models.cascade import fft2_shifted

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 128, 128, 4)).astype(np.float32))
    got = fft2_shifted(x)
    xf = jnp.fft.fftshift(jnp.fft.fft2(x, axes=(1, 2), norm="ortho"), axes=(1, 2))
    want = jnp.concatenate([xf.real, xf.imag], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fourier_forward_parity_with_torch_oracle():
    model, params, sd_net, sd_fnet, x, uv = _fourier_setup()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    y_t, yhat_t, Mu_t = torch_fourier_pipeline(sd_net, sd_fnet, xt, torch.from_numpy(uv))

    out = model.apply(params, jnp.asarray(x), jnp.asarray(uv))
    np.testing.assert_allclose(
        np.asarray(out.yf_in), y_t.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.yf_out), yhat_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(out.Mu), Mu_t.numpy(), rtol=1e-3, atol=2e-4)


def test_fourier_admm_full_residual_semantics():
    """The variant's second ADMM constraint acts on the FULL 2C-channel Fourier
    residual: duals sized to it, loss2 = (y2 . r2 + rho/2 ||r2||^2) / r2.size."""
    from lshm_tpu.train.objective import Duals, LossWeights, cascade_objective

    model, params, _, _, x, uv = _fourier_setup(seed=1)
    numel = x.size
    rng = np.random.default_rng(2)
    duals = Duals(
        y1=jnp.asarray(rng.normal(size=numel).astype(np.float32)),
        y2=jnp.asarray(rng.normal(size=2 * numel).astype(np.float32)),
        y3=jnp.zeros((0,), jnp.float32),
    )
    w = LossWeights()
    _, metrics = cascade_objective(
        model, params, jnp.asarray(x), jnp.asarray(uv), duals, w, num_groups=2
    )
    out = model.apply(params, jnp.asarray(x), jnp.asarray(uv))
    r2 = np.asarray(out.yf_in - out.yf_out).reshape(-1)
    want = (np.asarray(duals.y2) @ r2 + 0.5 * float(w.rho) * r2 @ r2) / r2.size
    # rtol bounded by f32 accumulation order over the 262k-element dot products
    np.testing.assert_allclose(float(metrics["loss2"]), want, rtol=1e-3)
    assert float(metrics["loss3"]) == 0.0


def test_fourier_recon_panels(tmp_path, synth_h5):
    """Fourier-variant eval panels render the y/yhat Fourier features
    (reference: src/EvaluateClusters.ipynb cell 18)."""
    from lshm_tpu.eval import save_recon_panels

    model, params, _, _, _, _ = _fourier_setup(seed=9)
    save_recon_panels(model, params, synth_h5, "0", [0], str(tmp_path / "p"))
    assert (tmp_path / "p" / "xx_0.png").stat().st_size > 0


def test_fourier_checkpoint_import_roundtrip(tmp_path):
    """net/fnet/khm trio (the published models.zip layout, Demo.ipynb cell 6) imports
    and runs the fourier cascade."""
    from lshm_tpu.utils.torch_import import load_reference_checkpoints_fourier

    rng = np.random.default_rng(3)
    paths = {}
    for name, ch, latent in (("net", 4, L), ("fnet", 8, LF)):
        sd = make_torch_sd(rng, 2, channels=ch, latent=latent)
        p = tmp_path / f"{name}.model"
        torch.save(
            {"model_state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}}, p
        )
        paths[name] = str(p)
    M = rng.normal(size=(KC, L + LF), scale=0.5).astype(np.float32)
    p = tmp_path / "khm.model"
    torch.save({"model_state_dict": {"M": torch.from_numpy(M)}}, p)

    params = load_reference_checkpoints_fourier(paths["net"], paths["fnet"], str(p))
    cfg = ModelConfig(latent_dim=L, latent_dim_fourier=LF, num_clusters=KC,
                      rica=True, fourier_variant=True)
    model = CascadedAE(cfg=cfg)
    rngk = jax.random.PRNGKey(0)
    out = model.apply(params, jax.random.normal(rngk, (2, 128, 128, 4)),
                      jax.random.normal(jax.random.fold_in(rngk, 1), (2, 2)))
    assert out.Mu.shape == (2, L + LF)
    assert np.all(np.isfinite(np.asarray(out.yf_out)))


def test_fourier_train_step_and_dual_shapes():
    """End-to-end fourier_cascade ADMM step: finite losses, and the dual update grows
    y2 by rho * full residual."""
    from lshm_tpu.train import LossWeights, init_train_state, make_train_step
    from lshm_tpu.train.objective import Duals, dual_update

    cfg = Config(
        data=DataConfig(batch_size=2),
        model=ModelConfig(latent_dim=L, latent_dim_1d=8, latent_dim_fourier=LF,
                          num_clusters=KC, rica=True, fourier_variant=True),
        optim=OptimConfig(optimizer="adam", adam_lr=1e-3),
        train=TrainConfig(admm_iters=2),
    )
    model = CascadedAE(cfg=cfg.model)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 128, 128, 4), jnp.float32)
    uv = jax.random.normal(jax.random.fold_in(key, 1), (2, 2), jnp.float32)
    state, tx = init_train_state(model, cfg, jax.random.fold_in(key, 2), x, uv)

    d0 = Duals.zeros(x.size, fourier=True)
    assert d0.y2.shape == (2 * x.size,) and d0.y3.shape == (0,)
    d1 = dual_update(model, state.params, x, uv, d0, 1.0)
    out = model.apply(state.params, x, uv)
    np.testing.assert_allclose(
        np.asarray(d1.y2), np.asarray(out.yf_in - out.yf_out).reshape(-1), rtol=1e-6
    )

    step = make_train_step(model, tx, cfg, num_groups=2, donate=False)
    state2, metrics = step(state, x, uv, LossWeights())
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))
    # the optimizer actually moved the Fourier AE
    a = jax.tree.leaves(state.params["params"]["aef"])[0]
    b = jax.tree.leaves(state2.params["params"]["aef"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
