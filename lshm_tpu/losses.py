"""Fused, vectorized loss functions.

The reference computes its clustering/contrastive losses with Python loops over batch and
clusters (reference: src/lofar_models.py:199-229, src/kharmonic_lofar.py:97-110), which
serialize on host dispatch.  Here every loss is a closed-form batched expression whose hot
op is a single MXU matmul (pairwise inner products), letting XLA fuse the entire objective
into a few kernels.  A Pallas fusion of the KHM distance+harmonic+similarity path lives in
lshm_tpu/kernels/.

All losses reproduce the reference normalizations exactly (golden-value tested).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-9  # reference: src/lofar_models.py:195


def pairwise_sq_dists(X: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    """||x_i - m_k||^2 for X [N, D], M [K, D] -> [N, K] via one matmul (MXU-friendly)."""
    xx = jnp.sum(X * X, axis=-1, keepdims=True)            # [N, 1]
    mm = jnp.sum(M * M, axis=-1)[None, :]                  # [1, K]
    xm = X @ M.T                                           # [N, K]  (the MXU op)
    return jnp.maximum(xx + mm - 2.0 * xm, 0.0)


def khm_loss(X: jnp.ndarray, M: jnp.ndarray, p: int = 4, eps: float = EPS) -> jnp.ndarray:
    """K-harmonic-means clustering loss.

    mean-style sum over batch of K / sum_k 1/(||x - m_k||^p + eps), normalized by
    nbatch * K * latent_dim (reference: src/lofar_models.py:199-209).
    """
    N, D = X.shape
    K = M.shape[0]
    d2 = pairwise_sq_dists(X, M)
    if p % 2 == 0:
        dp = d2 ** (p // 2)
    else:
        dp = jnp.sqrt(d2 + 1e-30) ** p
    ek = jnp.sum(1.0 / (dp + eps), axis=-1)                # [N]
    return jnp.sum(K / (ek + eps)) / (N * K * D)


def khm_distances(X: jnp.ndarray, M: jnp.ndarray, p: int = 4) -> jnp.ndarray:
    """Per-cluster mean p-th-power distance over a patch batch: [K].

    dist_k = mean_n ||x_n - m_k||^p — the evaluation statistic used to build the
    per-baseline cluster-distance matrix (reference: src/evaluate_clustering.py:111-115).
    """
    d2 = pairwise_sq_dists(X, M)
    if p % 2 == 0:
        dp = d2 ** (p // 2)
    else:
        dp = jnp.sqrt(d2 + 1e-30) ** p
    return jnp.mean(dp, axis=0)


def cluster_similarity_loss(M: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Contrastive centroid-separation penalty.

    For each centroid k: sum_{l != k} exp(m_k . m_l / (||m_k|| ||m_l|| + eps)) divided by
    exp(m_k . m_k / (||m_k||^2 + eps)) + eps, summed over k and normalized by K * latent
    (reference: src/lofar_models.py:214-229).
    """
    K, D = M.shape
    G = M @ M.T                                            # [K, K]
    n = jnp.sqrt(jnp.diagonal(G))
    C = G / (n[:, None] * n[None, :] + eps)
    E = jnp.exp(C)
    diag = jnp.diagonal(E)                                 # exp(m.m/(|m|^2+eps)) ~ e
    num = jnp.sum(E, axis=-1) - diag
    return jnp.sum(num / (diag + eps)) / (K * D)


def augmentation_loss(Z: jnp.ndarray, num_groups: int, eps: float = 1e-6) -> jnp.ndarray:
    """Intra-baseline latent-agreement (contrastive pull) loss.

    Z [N, D] is baseline-major with N = num_groups * P; for each group the loss is
    sum_{i<j} exp(-zhat_i . zhat_j) / P, summed over groups and normalized by N
    (reference: src/kharmonic_lofar.py:97-110, with the grouping fixed to be
    baseline-major — see lshm_tpu/data/h5io.py).
    """
    N, D = Z.shape
    P = N // num_groups
    nrm = jnp.linalg.norm(Z, axis=-1, keepdims=True)
    Zn = Z / (nrm + eps)
    G = Zn.reshape(num_groups, P, D)
    S = jnp.einsum("bpd,bqd->bpq", G, G)                   # [B, P, P]
    E = jnp.exp(-S)
    mask = jnp.triu(jnp.ones((P, P), Z.dtype), k=1)
    per_group = jnp.sum(E * mask[None], axis=(1, 2))       # sum_{i<j}
    return jnp.sum(per_group / P) / (num_groups * P)


def log_cosh(x: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable log(cosh(x)) = |x| + log1p(exp(-2|x|)) - log(2)."""
    a = jnp.abs(x)
    return a + jnp.log1p(jnp.exp(-2.0 * a)) - jnp.log(2.0)


def rica_loss(*latents: jnp.ndarray) -> jnp.ndarray:
    """Differentiable L1 surrogate: sum over latents of mean log-cosh
    (reference: src/kharmonic_lofar.py:167-172)."""
    total = 0.0
    for mu in latents:
        total = total + jnp.sum(log_cosh(mu)) / mu.size
    return total


def mse_sum(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """nn.MSELoss(reduction='sum') equivalent."""
    d = a - b
    return jnp.sum(d * d)


def admm_term(y: jnp.ndarray, residual: jnp.ndarray, rho: float) -> jnp.ndarray:
    """Augmented-Lagrangian term y . vec(r) + rho/2 * ||r||^2, un-normalized
    (caller divides by numel; reference: src/kharmonic_lofar.py:156-158).

    ``y`` may be flat [numel] (reference representation) or shaped like the residual
    (the TPU-preferred representation: avoids a 110 MB relayout per term — duals
    created by ``Duals.zeros_like`` keep the residual's own NHWC layout)."""
    if y.shape == residual.shape:
        return jnp.sum(y * residual) + 0.5 * rho * jnp.sum(residual * residual)
    r = residual.reshape(-1)
    return jnp.dot(y, r) + 0.5 * rho * jnp.dot(r, r)
