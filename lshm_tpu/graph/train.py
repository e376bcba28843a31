"""Graph-classifier training over learned latents.

The reference extracts per-baseline latents with a Python loop over baselines and trains
PyG nets full-graph (reference: src/train_graph.py:137-209, src/train_graph_stat.py:161-268).
Here feature extraction reuses the batched jitted cascade inference from lshm_tpu.eval and
the GNN train step is a single jitted Adam update on the full graph.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lshm_tpu.graph.build import conjugate_channels, line_graph_edges
from lshm_tpu.graph.gnn import LineGraphNet, StationGraphNet


@dataclass
class GraphData:
    x: np.ndarray                   # [n_nodes, F]
    edge_index: np.ndarray          # [2, E]
    y: np.ndarray                   # [n_nodes, L]
    edge_attr: np.ndarray | None = None
    node_mask: np.ndarray | None = None


def build_line_graph_data(model, params, filename, sap, patch_size=128, num_channels=4,
                          order=4) -> GraphData:
    """Line graph: node features = per-baseline mean latent; labels = per-cluster mean
    distances (reference: src/train_graph.py:120-163)."""
    from lshm_tpu.data.h5io import read_metadata
    from lshm_tpu.eval.clustering import baseline_distance_matrix

    baselines, _ = read_metadata(filename, sap, give_baselines=True)
    X, latents = baseline_distance_matrix(
        model, params, filename, sap, patch_size, num_channels, order
    )
    edge_index = line_graph_edges(baselines)
    return GraphData(x=latents, edge_index=edge_index, y=X.T.astype(np.float32))


def train_line_graph(
    data: GraphData, hidden: int = 4, epochs: int = 200, lr: float = 0.01, seed: int = 0
):
    """Full-graph Adam + MSE training (reference: src/train_graph.py:199-209).
    Returns (model, params, losses)."""
    model = LineGraphNet(hidden=hidden, out_features=data.y.shape[1])
    x = jnp.asarray(data.x)
    ei = jnp.asarray(data.edge_index)
    y = jnp.asarray(data.y)
    params = model.init(jax.random.PRNGKey(seed), x, ei)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.apply(p, x, ei)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(epochs):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    return model, params, losses


def build_station_graph_data(
    model, params, filename, sap, stations: dict, baseline_map: dict,
    patch_size=128, num_channels=4, order=4, rng=None,
) -> GraphData:
    """Station graph from one SAP: node features/labels from autocorrelations, edge
    features from cross-correlations in both directions (reverse = conjugate; reference:
    src/train_graph_stat.py:161-258).  One random patch per baseline, as the reference."""
    from lshm_tpu.data.h5io import read_baselines_patches_batch, read_metadata

    rng = rng or np.random.default_rng(0)
    baselines, _ = read_metadata(filename, sap, give_baselines=True)
    n_stat = len(stations)
    n_edges = len(baseline_map)
    M = np.asarray(params["params"]["khm"]["M"])
    Kc = M.shape[0]

    node_attr = None
    node_labels = None
    node_mask = np.zeros(n_stat, bool)
    edge_attr = None
    edge_used = np.zeros(n_edges, bool)
    edge_index = np.zeros((2, n_edges), np.int64)

    def latents_of(patches, uv):
        out = model.apply(params, jnp.asarray(patches), jnp.asarray(uv))
        return np.asarray(out.Mu)

    # chunked read (one h5 open per chunk) + one batched forward per chunk covering
    # both the selected patches and their conjugates (VERDICT round 2 item 7)
    chunk_size = 16
    nbase = len(baselines)
    for start in range(0, nbase, chunk_size):
        ids = list(range(start, min(start + chunk_size, nbase)))
        _, _, patches, uv, pairs = read_baselines_patches_batch(
            filename, sap, ids, patch_size, num_channels, uvdist=True,
            give_baselines=True,
        )
        ppb = patches.shape[0] // len(ids)
        sel = np.array([int(rng.integers(0, ppb)) for _ in ids])
        rows = np.arange(len(ids)) * ppb + sel
        xsel, uvsel = patches[rows], uv[rows]
        # conjugate latents are only consumed by cross-correlation edges (the
        # reverse edge direction); autocorrelation conjugate rows are wasted
        # forwards, but skipping them would make the batch shape vary with the
        # per-chunk autocorrelation count — every distinct shape is a fresh XLA
        # compile (minutes on the relay), which costs far more than the <=n_stat
        # spare rows per SAP. Keep the shape fixed at 2*len(ids).
        Mu_all = latents_of(
            np.concatenate([xsel, conjugate_channels(xsel)]),
            np.concatenate([uvsel, uvsel]),
        )
        Mu_sel = Mu_all[: len(ids)]
        Mu_conj = Mu_all[len(ids):]
        if node_attr is None:
            D = Mu_sel.shape[-1]
            node_attr = np.zeros((n_stat, D), np.float32)
            node_labels = np.zeros((n_stat, Kc), np.float32)
            edge_attr = np.zeros((n_edges, D), np.float32)

        for i, nb in enumerate(ids):
            s1 = int(pairs[i][0])
            s2 = int(pairs[i][1])
            Mu = Mu_sel[i]
            dist = np.array([np.linalg.norm(Mu - M[k]) ** order for k in range(Kc)])
            soft = _softmax(-dist / dist.mean())
            if s1 == s2:
                sid = stations[s1]
                node_mask[sid] = True
                node_attr[sid] = Mu
                node_labels[sid] = soft
            else:
                eid = baseline_map[(s1, s2)]
                edge_index[:, eid] = (stations[s1], stations[s2])
                edge_attr[eid] = Mu
                edge_used[eid] = True
                # reverse direction: conjugated input
                eid2 = baseline_map[(s2, s1)]
                edge_index[:, eid2] = (stations[s2], stations[s1])
                edge_attr[eid2] = Mu_conj[i]
                edge_used[eid2] = True

    # keep only populated edges (static shapes for jit)
    keep = np.nonzero(edge_used)[0]
    return GraphData(
        x=node_attr, edge_index=edge_index[:, keep], y=node_labels,
        edge_attr=edge_attr[keep], node_mask=node_mask,
    )


def train_station_graph(
    data: GraphData, epochs: int = 20, lr: float = 0.01, seed: int = 0,
    edge_mlp_hidden=(256, 128),
):
    """Masked-node MSE training of the edge-conditioned station net
    (reference: src/train_graph_stat.py:262-268)."""
    model = StationGraphNet(out_features=data.y.shape[1], edge_mlp_hidden=edge_mlp_hidden)
    x = jnp.asarray(data.x)
    ei = jnp.asarray(data.edge_index)
    ea = jnp.asarray(data.edge_attr)
    y = jnp.asarray(data.y)
    mask = jnp.asarray(data.node_mask.astype(np.float32))[:, None]
    params = model.init(jax.random.PRNGKey(seed), x, ei, ea)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step = _make_station_step(model, tx)

    losses = []
    for _ in range(epochs):
        params, opt_state, loss = step(params, opt_state, x, ei, ea, y, mask)
        losses.append(float(loss))
    return model, params, losses


def _make_station_step(model, tx):
    """Jitted (params, opt_state, graph arrays) -> (params, opt_state, loss) update;
    graph shapes may change across rebuilds (jit retraces per shape signature)."""

    @jax.jit
    def step(params, opt_state, x, ei, ea, y, mask):
        def loss_fn(p):
            pred = model.apply(p, x, ei, ea)
            return jnp.sum(mask * (pred - y) ** 2) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def train_station_graph_epochs(
    model, params, files, saps, stations: dict, baseline_map: dict,
    epochs: int = 5, steps_per_graph: int = 20, lr: float = 0.01, seed: int = 0,
    patch_size: int = 128, num_channels: int = 4, order: int = 4,
    edge_mlp_hidden=(256, 128),
):
    """Per-epoch stochastic graph-rebuild training (reference:
    src/train_graph_stat.py:161-268): every epoch draws a random SAP, rebuilds the
    station graph from ONE random patch per baseline, and keeps training the SAME
    GraphNet with the SAME Adam state across rebuilds.

    Returns (graph_model, graph_params, losses) with one loss entry per
    (epoch, inner step)."""
    rng = np.random.default_rng(seed)
    tx = optax.adam(lr)
    gmodel = None
    gparams = None
    opt_state = None
    step = None
    losses: list[float] = []
    for _ in range(epochs):
        si = int(rng.integers(0, len(files)))
        data = build_station_graph_data(
            model, params, files[si], saps[si], stations, baseline_map,
            patch_size, num_channels, order, rng=rng,
        )
        x = jnp.asarray(data.x)
        ei = jnp.asarray(data.edge_index)
        ea = jnp.asarray(data.edge_attr)
        y = jnp.asarray(data.y)
        mask = jnp.asarray(data.node_mask.astype(np.float32))[:, None]
        if gmodel is None:
            gmodel = StationGraphNet(out_features=y.shape[1],
                                     edge_mlp_hidden=edge_mlp_hidden)
            gparams = gmodel.init(jax.random.PRNGKey(seed), x, ei, ea)
            opt_state = tx.init(gparams)
            step = _make_station_step(gmodel, tx)
        for _ in range(steps_per_graph):
            gparams, opt_state, loss = step(gparams, opt_state, x, ei, ea, y, mask)
            losses.append(float(loss))
    return gmodel, gparams, losses


def _softmax(v):
    e = np.exp(v - v.max())
    return e / e.sum()
