"""Graph subsystem tests: builders, segment-sum GNN layers vs dense oracles, and
end-to-end line/station graph training on the synthetic fixture."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lshm_tpu.config import ModelConfig
from lshm_tpu.graph import (
    EdgeConditionedConv,
    GCNConv,
    build_line_graph_data,
    build_station_graph_data,
    conjugate_channels,
    line_graph_edges,
    station_graph_maps,
    train_line_graph,
    train_station_graph,
)
from lshm_tpu.models import CascadedAE


def test_line_graph_edges_semantics():
    # 3 stations, baselines: (0,0) auto, (0,1), (1,2)
    bl = np.array([[0, 0], [0, 1], [1, 2]])
    ei = line_graph_edges(bl)
    edges = set(map(tuple, ei.T.tolist()))
    # baseline 0 shares station 0 with itself and baseline 1
    assert (0, 0) in edges and (0, 1) in edges
    # baseline 1 shares station 0 with baseline 0 and station 1 with baseline 2
    assert (1, 0) in edges and (1, 2) in edges and (1, 1) in edges
    # baseline 2 shares station 1 with baseline 1
    assert (2, 1) in edges


def test_station_graph_maps():
    bl = np.array([[0, 0], [0, 1], [1, 2], [1, 1]])
    stations, bmap = station_graph_maps([bl])
    assert len(stations) == 3
    # cross-correlations, both directions
    assert set(bmap.keys()) == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_conjugate_channels():
    x = np.arange(8, dtype=np.float32).reshape(1, 1, 8)
    c = conjugate_channels(x)
    np.testing.assert_array_equal(c[0, 0], [0, -1, 2, -3, 4, -5, 6, -7])


def test_gcnconv_matches_dense_oracle():
    rng = np.random.default_rng(0)
    n, f_in, f_out = 5, 3, 2
    x = rng.normal(size=(n, f_in)).astype(np.float32)
    edges = np.array([[0, 1], [1, 0], [1, 2], [2, 1], [3, 4], [4, 3]]).T
    m = GCNConv(f_out)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(edges))
    got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(edges)))

    W = np.asarray(params["params"]["Dense_0"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    A = np.zeros((n, n), np.float32)
    for s, d in edges.T:
        A[d, s] = 1.0     # message s -> d
    A += np.eye(n, dtype=np.float32)
    deg = A.sum(axis=1)
    Dm = np.diag(1.0 / np.sqrt(deg))
    want = Dm @ A @ Dm @ (x @ W) + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_edge_conditioned_conv_mean_aggregation():
    rng = np.random.default_rng(1)
    n, f_in, f_out, fe = 4, 3, 2, 5
    x = rng.normal(size=(n, f_in)).astype(np.float32)
    edges = np.array([[0, 1], [2, 1], [3, 1]]).T   # all into node 1
    ea = rng.normal(size=(3, fe)).astype(np.float32)
    m = EdgeConditionedConv(f_out, edge_mlp_hidden=(8,))
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(edges), jnp.asarray(ea))
    got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(edges), jnp.asarray(ea)))
    # nodes with no incoming edges get only root transform + bias
    p = params["params"]
    root = x @ np.asarray(p["Dense_2"]["kernel"])
    b = np.asarray(p["bias"])
    np.testing.assert_allclose(got[0], root[0] + b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[2], root[2] + b, rtol=1e-5, atol=1e-6)
    # node 1 aggregates the mean of 3 messages
    h = ea
    h = np.maximum(0, h @ np.asarray(p["Dense_0"]["kernel"]) + np.asarray(p["Dense_0"]["bias"]))  # elu>0 region? use exact below
    # recompute messages exactly through the module by zeroing root weight
    p2 = jax.tree.map(lambda a: a, params)
    p2 = {"params": dict(p2["params"])}
    p2["params"]["Dense_2"] = jax.tree.map(jnp.zeros_like, params["params"]["Dense_2"])
    agg = np.asarray(m.apply(p2, jnp.asarray(x), jnp.asarray(edges), jnp.asarray(ea))) - b
    assert np.abs(agg[0]).max() < 1e-6
    assert np.abs(agg[1]).max() > 0


@pytest.fixture(scope="module")
def small_model():
    cfg = ModelConfig(latent_dim=16, latent_dim_1d=8, num_clusters=4, rica=True)
    model = CascadedAE(cfg=cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 4)), jnp.zeros((1, 2))
    )
    return model, params


@pytest.mark.slow
def test_line_graph_end_to_end(small_model, synth_h5):
    model, params = small_model
    data = build_line_graph_data(model, params, synth_h5, "0")
    assert data.x.shape == (10, 32)
    assert data.y.shape == (10, 4)
    gmodel, gparams, losses = train_line_graph(data, hidden=4, epochs=60)
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_draw_graph_artifacts(small_model, synth_h5, tmp_path):
    """Graph-structure PNG rendering (reference: src/train_graph.py:163-185)."""
    from lshm_tpu.data.h5io import read_metadata
    from lshm_tpu.graph import (
        build_station_graph_data, draw_graph, station_graph_maps,
    )

    model, params = small_model
    data = build_line_graph_data(model, params, synth_h5, "0")
    out = draw_graph(data, str(tmp_path / "line.png"), title="line")
    assert (tmp_path / "line.png").stat().st_size > 0

    baselines, _ = read_metadata(synth_h5, "0", give_baselines=True)
    stations, bmap = station_graph_maps([baselines])
    sdata = build_station_graph_data(model, params, synth_h5, "0", stations, bmap)
    draw_graph(sdata, str(tmp_path / "stat.png"), directed=True)
    assert (tmp_path / "stat.png").stat().st_size > 0


@pytest.mark.slow
def test_station_graph_end_to_end(small_model, synth_h5):
    from lshm_tpu.data.h5io import read_metadata

    model, params = small_model
    baselines, _ = read_metadata(synth_h5, "0", give_baselines=True)
    stations, bmap = station_graph_maps([baselines])
    data = build_station_graph_data(model, params, synth_h5, "0", stations, bmap)
    assert data.x.shape[0] == 4                 # 4 stations
    assert data.edge_attr.shape[0] == len(bmap)  # all cross-corr edges populated
    assert data.node_mask.sum() == 4             # all autocorrs present
    gmodel, gparams, losses = train_station_graph(data, epochs=30, edge_mlp_hidden=(16, 8))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_station_graph_epoch_rebuild_training(small_model, synth_h5, tmp_path):
    """Per-epoch stochastic rebuild loop (reference: src/train_graph_stat.py:161-268,
    VERDICT round 2 item 5): the SAME GraphNet + Adam state trains across >=3 randomly
    rebuilt graphs (random SAP choice + fresh random patch per baseline) and the loss
    decreases across rebuilds."""
    from lshm_tpu.data.h5io import read_metadata
    from lshm_tpu.data.synthetic import write_synthetic_h5
    from lshm_tpu.graph import train_station_graph_epochs

    model, params = small_model
    # two SAP sources so the per-epoch random SAP draw is real
    second = str(tmp_path / "L000002.MS_extract.h5")
    write_synthetic_h5(second, nstations=4, ntime=192, nfreq=192, seed=11)
    files, saps = [synth_h5, second], ["0", "0"]

    baselines_per_sap = [read_metadata(f, s, give_baselines=True)[0]
                         for f, s in zip(files, saps)]
    stations, bmap = station_graph_maps(baselines_per_sap)

    epochs, spg = 3, 12
    gmodel, gparams, losses = train_station_graph_epochs(
        model, params, files, saps, stations, bmap,
        epochs=epochs, steps_per_graph=spg, edge_mlp_hidden=(16, 8), seed=5,
    )
    assert len(losses) == epochs * spg
    assert np.isfinite(losses).all()
    # optimizer state persists across rebuilds: the last rebuilt graph starts better
    # than the first graph started, and the overall trend is down
    assert losses[-1] < losses[0]
    assert np.mean(losses[-spg:]) < np.mean(losses[:spg])
