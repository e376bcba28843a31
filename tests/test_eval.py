"""Evaluation-pipeline tests on the synthetic H5 fixture."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lshm_tpu.config import ModelConfig
from lshm_tpu.eval import baseline_distance_matrix, evaluate_sap, nmi
from lshm_tpu.models import CascadedAE


@pytest.fixture(scope="module")
def small_model():
    cfg = ModelConfig(latent_dim=16, latent_dim_1d=8, num_clusters=4, rica=True)
    model = CascadedAE(cfg=cfg)
    x = jnp.zeros((1, 128, 128, 4))
    uv = jnp.zeros((1, 2))
    params = model.init(jax.random.PRNGKey(0), x, uv)
    return model, params


def test_distance_matrix_shape_and_oracle(small_model, synth_h5):
    model, params = small_model
    X, latents = baseline_distance_matrix(
        model, params, synth_h5, "0", order=4, baselines_per_batch=4
    )
    assert X.shape == (4, 10)       # K=4 clusters, 10 baselines
    assert latents.shape == (10, 32)  # 16 + 8 + 8
    assert np.all(np.isfinite(X))
    # oracle for baseline 0: forward + double-loop distance
    from lshm_tpu.data.h5io import read_baseline_patches

    _, _, patches, uv = read_baseline_patches(synth_h5, "0", 0, 128, 4, uvdist=True)
    out = model.apply(params, jnp.asarray(patches), jnp.asarray(uv))
    Mu = np.asarray(out.Mu)
    M = np.asarray(params["params"]["khm"]["M"])
    want = np.array(
        [np.mean([np.linalg.norm(mu - m) ** 4 for mu in Mu]) for m in M]
    )
    np.testing.assert_allclose(X[:, 0], want, rtol=2e-3)


def test_evaluate_sap_full(small_model, synth_h5, tmp_path):
    model, params = small_model
    res = evaluate_sap(
        model, params, synth_h5, "0",
        num_hard_clusters=3, out_dir=str(tmp_path), montages=True,
    )
    assert res.X.shape == (4, 10)
    # row-demeaned
    np.testing.assert_allclose(res.X.mean(axis=1), 0.0, atol=1e-6)
    assert res.soft_assign.shape == (10,)
    assert res.labels is not None and len(set(res.labels.tolist())) <= 3
    assert res.embedding.shape == (10, 2)
    # artifacts written
    assert (tmp_path / "X.mat").exists()
    assert (tmp_path / "M.mat").exists()
    assert (tmp_path / "scatter.png").exists()
    assert len(list(tmp_path.glob("b*_*.png"))) == 10


def test_distance_matrix_single_trace(small_model, synth_h5):
    """A partial tail chunk (10 baselines, bpb=4 -> 4+4+2) must NOT re-trace the jitted
    feature extractor: the tail is padded to a full batch and sliced on the host —
    on BOTH the device-decode default and the host-decode oracle path."""
    from lshm_tpu.eval.clustering import _batched_features, _decode_and_features

    model, params = small_model
    _decode_and_features.clear_cache()
    baseline_distance_matrix(
        model, params, synth_h5, "0", order=4, baselines_per_batch=4
    )
    assert _decode_and_features._cache_size() == 1

    _batched_features.clear_cache()
    baseline_distance_matrix(
        model, params, synth_h5, "0", order=4, baselines_per_batch=4,
        device_decode=False,
    )
    assert _batched_features._cache_size() == 1


def test_distance_matrix_pipelined_matches_serial(small_model, synth_h5):
    """The decode/compute-overlapped path (decode_lookahead>0, the default) must be
    bit-identical to the serial path — same chunks, same order, same padding."""
    model, params = small_model
    ser_X, ser_lat = baseline_distance_matrix(
        model, params, synth_h5, "0", order=4, baselines_per_batch=4,
        decode_lookahead=0,
    )
    for la in (1, 2, 4):
        X, lat = baseline_distance_matrix(
            model, params, synth_h5, "0", order=4, baselines_per_batch=4,
            decode_lookahead=la,
        )
        np.testing.assert_array_equal(X, ser_X)
        np.testing.assert_array_equal(lat, ser_lat)


def test_nmi():
    a = np.array([0, 0, 1, 1, 2, 2])
    assert nmi(a, a) == 1.0
    perm = np.array([2, 2, 0, 0, 1, 1])  # relabeled -> still NMI 1
    assert nmi(a, perm) == 1.0
    rnd = np.array([0, 1, 0, 1, 0, 1])
    assert nmi(a, rnd) < 0.6


def test_save_recon_panels(small_model, synth_h5, tmp_path):
    from lshm_tpu.eval import save_recon_panels

    model, params = small_model
    save_recon_panels(model, params, synth_h5, "0", [0, 1], str(tmp_path / "panels"))
    assert (tmp_path / "panels" / "xx_0.png").exists()
    assert (tmp_path / "panels" / "xx_1.png").exists()


@pytest.mark.slow
def test_distance_matrix_chunk_size_invariance(small_model, synth_h5):
    """X and the latents must not depend on baselines_per_batch — regression for the
    tail-chunk handling (padded rows discarded; padding added after decode must not
    corrupt real baselines; chunk larger than nbase works)."""
    model, params = small_model
    ref_X, ref_lat = baseline_distance_matrix(
        model, params, synth_h5, "0", order=4, baselines_per_batch=10
    )
    for bpb in (3, 7, 16):
        X, lat = baseline_distance_matrix(
            model, params, synth_h5, "0", order=4, baselines_per_batch=bpb
        )
        np.testing.assert_allclose(X, ref_X, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(lat, ref_lat, rtol=1e-5, atol=1e-6)
