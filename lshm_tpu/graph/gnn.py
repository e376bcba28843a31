"""Segment-sum graph neural networks (Flax).

TPU-native replacements for the reference's PyTorch-Geometric layers
(reference: src/train_graph.py:187-196 GCNConv stack; src/train_graph_stat.py:140-152
NNConv with an MLP edge network).  Message passing is expressed as gather + MXU matmul +
``jax.ops.segment_sum`` — static shapes, no scatter-serialization, fully jittable.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _segment_mean(data, segment_ids, num_segments):
    tot = jax.ops.segment_sum(data, segment_ids, num_segments)
    cnt = jax.ops.segment_sum(jnp.ones((data.shape[0], 1), data.dtype), segment_ids, num_segments)
    return tot / jnp.maximum(cnt, 1.0)


class GCNConv(nn.Module):
    """Graph convolution with added self-loops and symmetric D^-1/2 (A+I) D^-1/2
    normalization (the PyG GCNConv semantics used by the reference line-graph net)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, edge_index: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[0]
        src, dst = edge_index[0], edge_index[1]
        # add self loops
        loops = jnp.arange(n, dtype=src.dtype)
        src = jnp.concatenate([src, loops])
        dst = jnp.concatenate([dst, loops])
        h = nn.Dense(self.features, use_bias=False)(x)            # X W (MXU)
        deg = jax.ops.segment_sum(jnp.ones_like(src, h.dtype), dst, n)
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
        msg = h[src] * (dinv[src] * dinv[dst])[:, None]
        out = jax.ops.segment_sum(msg, dst, n)
        return out + self.param("bias", nn.initializers.zeros, (self.features,))


class EdgeConditionedConv(nn.Module):
    """Edge-conditioned convolution (PyG NNConv semantics, aggr='mean'):
    out_i = x_i W_root + mean_{j->i} x_j . reshape(h(e_ji), [in, out]) + b,
    where h is an MLP on edge features."""

    features: int
    edge_mlp_hidden: Sequence[int] = (256, 128)

    @nn.compact
    def __call__(self, x, edge_index, edge_attr):
        n, fin = x.shape
        src, dst = edge_index[0], edge_index[1]
        h = edge_attr
        for width in self.edge_mlp_hidden:
            h = nn.elu(nn.Dense(width)(h))
        W_e = nn.Dense(fin * self.features)(h).reshape(-1, fin, self.features)
        msg = jnp.einsum("ei,eio->eo", x[src], W_e)               # batched MXU matmul
        agg = _segment_mean(msg, dst, n)
        root = nn.Dense(self.features, use_bias=False)(x)
        return root + agg + self.param("bias", nn.initializers.zeros, (self.features,))


class LineGraphNet(nn.Module):
    """Two-layer GCN regressor: node latents -> per-cluster distance labels
    (reference: src/train_graph.py:187-196)."""

    hidden: int = 4
    out_features: int = 10

    @nn.compact
    def __call__(self, x, edge_index):
        x = nn.relu(GCNConv(self.hidden)(x, edge_index))
        return GCNConv(self.out_features)(x, edge_index)


class StationGraphNet(nn.Module):
    """Edge-conditioned station classifier with column softmax
    (reference: src/train_graph_stat.py:140-152)."""

    out_features: int = 10
    edge_mlp_hidden: Sequence[int] = (256, 128)

    @nn.compact
    def __call__(self, x, edge_index, edge_attr):
        h = EdgeConditionedConv(self.out_features, self.edge_mlp_hidden)(
            x, edge_index, edge_attr
        )
        return jax.nn.softmax(h, axis=0)   # softmax over nodes, as in the reference
