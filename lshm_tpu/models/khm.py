"""Deep K-harmonic-means clustering head (Flax).

Learnable centroids M [K, latent_dim] with vectorized harmonic-mean / similarity losses
(reference: src/lofar_models.py:189-261 — whose Python double loops become single batched
expressions in lshm_tpu/losses.py).  Also provides the generalized-KHM recursive centroid
update (Zhang Eq. 7.1-7.5), which is dead *and* broken in the reference
(``torch.linlag.norm`` typo at src/lofar_models.py:248); here it is implemented correctly
and tested.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from lshm_tpu.losses import (
    EPS,
    cluster_similarity_loss,
    khm_distances,
    khm_loss,
    pairwise_sq_dists,
)


class KHarmonicMeans(nn.Module):
    latent_dim: int = 256
    num_clusters: int = 10
    order: int = 4                    # p in 1 / ||.||^p

    def setup(self):
        self.M = self.param(
            "M",
            nn.initializers.uniform(scale=1.0),
            (self.num_clusters, self.latent_dim),
        )

    def __call__(self, X: jnp.ndarray) -> jnp.ndarray:
        return khm_loss(X, self.M, self.order)

    def clustering_error(self, X: jnp.ndarray) -> jnp.ndarray:
        return khm_loss(X, self.M, self.order)

    def cluster_similarity(self) -> jnp.ndarray:
        return cluster_similarity_loss(self.M)

    def distances(self, X: jnp.ndarray) -> jnp.ndarray:
        """Per-cluster mean ||x - m_k||^p over the batch: [K] (eval statistic)."""
        return khm_distances(X, self.M, self.order)

    def assign(self, X: jnp.ndarray) -> jnp.ndarray:
        """Hard assignment: argmin_k ||x - m_k||."""
        return jnp.argmin(pairwise_sq_dists(X, self.M), axis=-1)


def khm_offline_update(
    X: jnp.ndarray, M: jnp.ndarray, p: int = 4, eps: float = EPS
) -> jnp.ndarray:
    """One generalized-K-harmonic-means centroid update (Zhang Eq. 7.1-7.5).

    alpha_i = 1 / (sum_k 1/d_ik^p)^2;  Q_ik = alpha_i / d_ik^(p+2);  P_ik = Q_ik / sum_i Q_ik
    M_k <- sum_i P_ik x_i.  Fully vectorized; fixes the reference's dead/broken
    ``offline_update`` (src/lofar_models.py:231-261).
    """
    d2 = pairwise_sq_dists(X, M)                        # [N, K]
    d = jnp.sqrt(d2 + 1e-30)
    ek = jnp.sum(1.0 / (d**p + eps), axis=-1)           # [N]
    alpha = 1.0 / (ek**2 + eps)                         # [N]
    Q = alpha[:, None] / (d ** (p + 2) + eps)           # [N, K]
    P = Q / (jnp.sum(Q, axis=0, keepdims=True) + eps)   # column-normalized
    return P.T @ X                                      # [K, D]
