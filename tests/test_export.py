"""Serving export: serialized StableHLO forward round-trips and matches the live
model, including the symbolic-batch artifact at multiple batch sizes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lshm_tpu.config import ModelConfig
from lshm_tpu.eval import export_forward, load_exported
from lshm_tpu.models import CascadedAE


@pytest.fixture(scope="module")
def small_model():
    cfg = ModelConfig(latent_dim=16, latent_dim_1d=8, num_clusters=4, rica=True)
    model = CascadedAE(cfg=cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 4)), jnp.zeros((1, 2))
    )
    return model, params


def _reference_outputs(model, params, x, uv, order=4):
    from lshm_tpu.losses import pairwise_sq_dists

    out = model.apply(params, x, uv)
    d2 = pairwise_sq_dists(out.Mu, params["params"]["khm"]["M"])
    return np.asarray(out.xrecon), np.asarray(out.Mu), np.asarray(d2 ** (order // 2))


def test_export_static_batch_roundtrip(small_model):
    model, params = small_model
    blob = export_forward(model, params, batch_size=2)
    assert isinstance(blob, bytes) and len(blob) > 1000
    fn = load_exported(blob)

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 128, 128, 4), jnp.float32)
    uv = jax.random.normal(jax.random.fold_in(key, 1), (2, 2), jnp.float32)
    xr, mu, dists = fn(x, uv)
    want_xr, want_mu, want_d = _reference_outputs(model, params, x, uv)
    np.testing.assert_allclose(np.asarray(xr), want_xr, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mu), want_mu, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dists), want_d, rtol=1e-3, atol=1e-5)


def test_export_symbolic_batch(small_model):
    """One artifact serves multiple batch sizes."""
    model, params = small_model
    blob = export_forward(model, params, batch_size=None)
    fn = load_exported(blob)
    key = jax.random.PRNGKey(2)
    for n in (1, 3):
        x = jax.random.normal(jax.random.fold_in(key, n), (n, 128, 128, 4), jnp.float32)
        uv = jnp.zeros((n, 2), jnp.float32)
        xr, mu, dists = fn(x, uv)
        assert xr.shape == (n, 128, 128, 4)
        assert mu.shape == (n, 32) and dists.shape == (n, 4)
        want_xr, want_mu, _ = _reference_outputs(model, params, x, uv)
        np.testing.assert_allclose(np.asarray(mu), want_mu, rtol=1e-4, atol=1e-5)


def test_cli_export(tmp_path, synth_h5, capsys):
    """End-to-end: train a step via CLI, export, deserialize in a plain-JAX context."""
    import os

    from lshm_tpu.cli import main

    data_dir = os.path.dirname(synth_h5)
    ckpt = str(tmp_path / "ck")
    main([
        "train", "--data-dir", data_dir, "--preset", "full_khm", "--quiet",
        "--set", "train.num_epochs=1", "--set", "train.iters_per_epoch=1",
        "--set", "train.admm_iters=1", "--set", "data.batch_size=2",
        "--set", "model.latent_dim=16", "--set", "model.latent_dim_1d=8",
        "--set", "model.num_clusters=3", "--set", f"train.checkpoint_dir={ckpt}",
    ])
    out_path = str(tmp_path / "fwd.jaxexp")
    main([
        "export", "--ckpt", ckpt, "--out", out_path, "--batch", "2",
        "--set", "data.batch_size=2", "--set", "model.latent_dim=16",
        "--set", "model.latent_dim_1d=8", "--set", "model.num_clusters=3",
    ])
    assert "exported forward" in capsys.readouterr().out
    fn = load_exported(open(out_path, "rb").read())
    xr, mu, dists = fn(jnp.zeros((2, 128, 128, 4)), jnp.zeros((2, 2)))
    assert np.all(np.isfinite(np.asarray(xr)))
    assert dists.shape == (2, 3)
