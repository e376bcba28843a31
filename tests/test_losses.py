"""Golden-value tests: vectorized losses vs straightforward double-loop numpy oracles
implementing the documented reference math (SURVEY.md §2; reference formulas at
src/lofar_models.py:199-229 and src/kharmonic_lofar.py:97-110)."""

import jax
import numpy as np
import jax.numpy as jnp

from lshm_tpu.losses import (
    EPS,
    admm_term,
    augmentation_loss,
    cluster_similarity_loss,
    khm_distances,
    khm_loss,
    log_cosh,
    mse_sum,
    pairwise_sq_dists,
    rica_loss,
)


def _khm_oracle(X, M, p):
    N, D = X.shape
    K = M.shape[0]
    loss = 0.0
    for i in range(N):
        ek = 0.0
        for k in range(K):
            ek += 1.0 / (np.linalg.norm(M[k] - X[i]) ** p + EPS)
        loss += K / (ek + EPS)
    return loss / (N * K * D)


def _similarity_oracle(M):
    K, D = M.shape
    loss = 0.0
    for i in range(K):
        ni = np.linalg.norm(M[i])
        den = np.exp(M[i] @ M[i] / (ni * ni + EPS))
        num = 0.0
        for j in range(K):
            if j != i:
                num += np.exp(M[i] @ M[j] / (ni * np.linalg.norm(M[j]) + EPS))
        loss += num / (den + EPS)
    return loss / (K * D)


def _augmentation_oracle(Z, B):
    N, D = Z.shape
    P = N // B
    loss = 0.0
    for b in range(B):
        G = Z[b * P : (b + 1) * P]
        prod = 0.0
        for i in range(P):
            zi = G[i] / (np.linalg.norm(G[i]) + 1e-6)
            for j in range(i + 1, P):
                zj = G[j] / (np.linalg.norm(G[j]) + 1e-6)
                prod += np.exp(-zi @ zj)
        loss += prod / P
    return loss / (B * P)


def test_pairwise_sq_dists():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(7, 5)).astype(np.float64)
    M = rng.normal(size=(3, 5)).astype(np.float64)
    got = np.asarray(pairwise_sq_dists(jnp.asarray(X), jnp.asarray(M)))
    want = ((X[:, None] - M[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_khm_loss_matches_oracle():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(12, 8)).astype(np.float64)
    M = rng.uniform(size=(5, 8)).astype(np.float64)
    got = float(khm_loss(jnp.asarray(X), jnp.asarray(M), p=4))
    np.testing.assert_allclose(got, _khm_oracle(X, M, 4), rtol=1e-6)


def test_khm_loss_odd_order():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(6, 4)).astype(np.float64)
    M = rng.uniform(size=(3, 4)).astype(np.float64)
    got = float(khm_loss(jnp.asarray(X), jnp.asarray(M), p=3))
    np.testing.assert_allclose(got, _khm_oracle(X, M, 3), rtol=1e-5)


def test_khm_distances():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(9, 6)).astype(np.float64)
    M = rng.uniform(size=(4, 6)).astype(np.float64)
    got = np.asarray(khm_distances(jnp.asarray(X), jnp.asarray(M), p=4))
    want = np.array(
        [np.mean([np.linalg.norm(x - m) ** 4 for x in X]) for m in M]
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_cluster_similarity_matches_oracle():
    rng = np.random.default_rng(4)
    M = rng.uniform(size=(6, 10)).astype(np.float64)
    got = float(cluster_similarity_loss(jnp.asarray(M)))
    np.testing.assert_allclose(got, _similarity_oracle(M), rtol=1e-6)


def test_augmentation_matches_oracle():
    rng = np.random.default_rng(5)
    B, P, D = 3, 4, 7
    Z = rng.normal(size=(B * P, D)).astype(np.float64)
    got = float(augmentation_loss(jnp.asarray(Z), num_groups=B))
    np.testing.assert_allclose(got, _augmentation_oracle(Z, B), rtol=1e-6)


def test_log_cosh_stable_and_exact():
    x = np.array([-200.0, -3.0, -0.1, 0.0, 0.1, 3.0, 200.0])
    got = np.asarray(log_cosh(jnp.asarray(x)))
    # exact for moderate x
    np.testing.assert_allclose(got[1:-1], np.log(np.cosh(x[1:-1])), rtol=1e-6, atol=1e-7)
    # stable (no overflow) for large x: log cosh x ~ |x| - log 2
    np.testing.assert_allclose(got[[0, -1]], np.abs(x[[0, -1]]) - np.log(2), rtol=1e-6)
    assert np.all(np.isfinite(got))


def test_rica_loss():
    rng = np.random.default_rng(6)
    a = rng.normal(size=(5, 3))
    b = rng.normal(size=(5, 2))
    got = float(rica_loss(jnp.asarray(a), jnp.asarray(b)))
    want = np.log(np.cosh(a)).mean() + np.log(np.cosh(b)).mean()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_mse_sum_and_admm_term():
    rng = np.random.default_rng(7)
    a = rng.normal(size=(4, 3)).astype(np.float64)
    b = rng.normal(size=(4, 3)).astype(np.float64)
    y = rng.normal(size=12).astype(np.float64)
    np.testing.assert_allclose(float(mse_sum(jnp.asarray(a), jnp.asarray(b))),
                               ((a - b) ** 2).sum(), rtol=1e-7)
    rho = 0.7
    want = y @ (a - b).reshape(-1) + rho / 2 * ((a - b) ** 2).sum()
    got = float(admm_term(jnp.asarray(y), jnp.asarray(a - b), rho))
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_khm_offline_update_converges():
    """The generalized-KHM recursive update should recover well-separated cluster means
    (it is not monotone per-iteration for high p, so test the fixed point instead)."""
    from lshm_tpu.models.khm import khm_offline_update

    rng = np.random.default_rng(8)
    centers = np.array([[-2.0] * 5, [0.0] * 5, [2.0] * 5])
    X = np.concatenate([rng.normal(loc=c, scale=0.2, size=(30, 5)) for c in centers])
    M = jnp.asarray(rng.uniform(size=(3, 5)))
    l0 = float(khm_loss(jnp.asarray(X), M, p=2))
    for _ in range(30):
        M = khm_offline_update(jnp.asarray(X), M, p=2)
    lT = float(khm_loss(jnp.asarray(X), M, p=2))
    assert lT < l0
    Mnp = np.asarray(M)
    # every true center has a recovered centroid within 0.3
    for c in centers:
        assert np.min(np.linalg.norm(Mnp - c, axis=1)) < 0.3


def test_recon_admm_losses_values_and_grads_match_autodiff():
    """The fused custom-VJP loss block must match the naive term-by-term expression
    in both values and gradients (w.r.t. x1, x2, x3), for shaped AND flat duals."""
    from lshm_tpu.losses import admm_term, mse_sum, recon_admm_losses

    rng = np.random.default_rng(11)
    shape = (3, 8, 8, 2)
    numel = int(np.prod(shape))
    x, x1, x2, x3 = (jnp.asarray(rng.normal(size=shape), jnp.float32) for _ in range(4))
    rho = 0.7

    def naive(x1, x2, x3, y1, y2, y3):
        x11 = (x - x1) * 0.5
        loss0 = mse_sum(x1 + x2 + x3, x) / numel
        loss1 = admm_term(y1, x - x1, rho) / numel
        loss2 = admm_term(y2, x11 - x2, rho) / numel
        loss3 = admm_term(y3, x11 - x3, rho) / numel
        return loss0, loss1, loss2, loss3

    def tot_naive(x1, x2, x3, y1, y2, y3):
        t = naive(x1, x2, x3, y1, y2, y3)
        return t[0] + 2.0 * t[1] + 3.0 * t[2] + 4.0 * t[3]

    def tot_fused(x1, x2, x3, y1, y2, y3):
        t = recon_admm_losses(x1, x2, x3, x, y1, y2, y3, rho)
        return t[0] + 2.0 * t[1] + 3.0 * t[2] + 4.0 * t[3]

    for flat in (False, True):
        yshape = (numel,) if flat else shape
        y1, y2, y3 = (jnp.asarray(rng.normal(size=yshape), jnp.float32)
                      for _ in range(3))
        v_naive = naive(x1, x2, x3, y1, y2, y3)
        v_fused = recon_admm_losses(x1, x2, x3, x, y1, y2, y3, rho)
        np.testing.assert_allclose(np.asarray(v_fused), np.asarray(v_naive),
                                   rtol=1e-6, atol=1e-6)
        g_naive = jax.grad(tot_naive, argnums=(0, 1, 2))(x1, x2, x3, y1, y2, y3)
        g_fused = jax.grad(tot_fused, argnums=(0, 1, 2))(x1, x2, x3, y1, y2, y3)
        for gn, gf in zip(g_naive, g_fused):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gn),
                                       rtol=1e-5, atol=1e-7)
