"""RICA dictionary learner tests: sparse-code solving reduces the objective, the
dictionary update moves toward a planted dictionary, and atom export works."""

import numpy as np
import jax
import pytest

from lshm_tpu.config import LBFGSConfig
from lshm_tpu.rica import RICAConfig, RICADictionaryLearner


def planted_problem(rng, L=24, M=8, n=32, sparsity=2):
    A_true = rng.normal(size=(L, M)).astype(np.float32)
    A_true /= np.linalg.norm(A_true, axis=0, keepdims=True)
    S = np.zeros((M, n), np.float32)
    for j in range(n):
        idx = rng.choice(M, sparsity, replace=False)
        S[idx, j] = rng.normal(size=sparsity)
    X = A_true @ S + 0.01 * rng.normal(size=(L, n)).astype(np.float32)
    return A_true, S, X.astype(np.float32)


def test_rica_objective_decreases():
    rng = np.random.default_rng(0)
    _, _, X = planted_problem(rng)
    cfg = RICAConfig(input_dim=24, dict_size=8, l1_weight=0.05,
                     solver=LBFGSConfig(max_iter=6, history_size=5,
                                        line_search=True, batch_mode=True))
    learner = RICADictionaryLearner(cfg, seed=0)
    losses = []
    for i in range(8):
        m = learner.fit_minibatch(X, jax.random.PRNGKey(i))
        losses.append(m["loss"])
    assert np.isfinite(losses).all()
    # reconstruction improves as the dictionary adapts
    assert min(losses[-3:]) < losses[0]


def test_rica_induced_norm_mode():
    rng = np.random.default_rng(1)
    _, _, X = planted_problem(rng)
    cfg = RICAConfig(input_dim=24, dict_size=8, l1_mode="induced",
                     solver=LBFGSConfig(max_iter=3, history_size=3,
                                        line_search=True, batch_mode=True))
    learner = RICADictionaryLearner(cfg, seed=0)
    m = learner.fit_minibatch(X, jax.random.PRNGKey(0))
    assert np.isfinite(m["loss"])


def test_rica_cli_smoke(synth_h5_dir, tmp_path, capsys):
    """End-to-end `lshm_tpu.cli rica`: sample from the synthetic SAP, fit a tiny
    dictionary, write the atom grid (reference: src/rica_lofar.py:44-104)."""
    from lshm_tpu.cli import main

    out = tmp_path / "rica_out"
    main([
        "rica", "--data-dir", synth_h5_dir, "--out", str(out),
        "--iters", "2", "--batch", "2", "--patch-size", "32", "--dict-size", "4",
        "--solver-iters", "2",
    ])
    assert (out / "dictionary_atoms.png").exists()
    lines = capsys.readouterr().out.strip().splitlines()
    assert any(line.startswith("rica 1 loss ") for line in lines)


def test_patch_column_roundtrip_and_atoms(tmp_path):
    rng = np.random.default_rng(2)
    patches = rng.normal(size=(6, 8, 8, 4)).astype(np.float32)
    X = RICADictionaryLearner.patches_to_columns(patches)
    assert X.shape == (4 * 64, 6)
    # row ordering is (c, h, w): row 0 = channel 0 at (0,0)
    np.testing.assert_allclose(X[0], patches[:, 0, 0, 0])
    np.testing.assert_allclose(X[64], patches[:, 0, 0, 1])  # second channel block

    cfg = RICAConfig(input_dim=256, dict_size=4)
    learner = RICADictionaryLearner(cfg, seed=0)
    atoms = learner.atoms(channels=4, patch=8)
    assert atoms.shape == (4, 8, 8, 4)
    learner.save_atom_images(str(tmp_path), channels=4, patch=8)
    assert (tmp_path / "dictionary_atoms.png").exists()
