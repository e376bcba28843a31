"""Property-based tests (hypothesis) for the data layer and config system.

The example-based suites pin the reference semantics; these sweep the input space for
invariants: patchify content/coverage laws on arbitrary shapes, numpy/JAX patchify
agreement, uv-embedding bounds, and round-trip robustness of the CLI override parser.
"""

import numpy as np
from hypothesis import given, settings, strategies as st


@st.composite
def spectrogram(draw, max_mult=3):
    """[n, T, F, C] float32 with T, F >= patch and patch in {8, 16}."""
    patch = draw(st.sampled_from([8, 16]))
    stride = patch // 2
    T = patch + stride * draw(st.integers(0, max_mult))
    F = patch + stride * draw(st.integers(0, max_mult))
    n = draw(st.integers(1, 3))
    C = draw(st.sampled_from([1, 4]))
    seed = draw(st.integers(0, 2**31 - 1))
    x = np.random.default_rng(seed).normal(size=(n, T, F, C)).astype(np.float32)
    return x, patch


@given(spectrogram())
@settings(max_examples=30, deadline=None)
def test_patchify_content_law(case):
    """Every patch equals the corresponding strided window of the source, in
    baseline-major (n, px, py) order."""
    from lshm_tpu.data.patches import patch_grid_shape, patchify

    x, patch = case
    n, T, F, C = x.shape
    stride = patch // 2
    out, (px, py) = patchify(x, patch)
    assert out.shape == (n * px * py, patch, patch, C)
    assert (px, py) == patch_grid_shape(T, F, patch)
    rng = np.random.default_rng(0)
    for _ in range(5):                       # spot-check random patches exactly
        k = int(rng.integers(0, out.shape[0]))
        b, r = divmod(k, px * py)
        i, j = divmod(r, py)
        want = x[b, i * stride : i * stride + patch, j * stride : j * stride + patch]
        np.testing.assert_array_equal(out[k], want)


@given(spectrogram())
@settings(max_examples=15, deadline=None)
def test_patchify_numpy_jax_agree(case):
    from lshm_tpu.data.patches import patchify, patchify_jax

    x, patch = case
    a, ga = patchify(x, patch)
    b, gb = patchify_jax(x, patch)
    assert ga == gb
    np.testing.assert_array_equal(a, np.asarray(b))


@given(st.integers(0, 2**31 - 1), st.integers(1, 16))
@settings(max_examples=20, deadline=None)
def test_uv_harmonic_bounds_and_shape(seed, n):
    """sin/cos embedding is always in [-1, 1] with shape [n, 4 * n_scales]."""
    import jax.numpy as jnp

    from lshm_tpu.models.autoencoders import uv_harmonic_features

    uv = np.random.default_rng(seed).normal(scale=1e4, size=(n, 2)).astype(np.float32)
    scales = (1e-4, 1e-3, 1e-2, 1e-1)
    f = np.asarray(uv_harmonic_features(jnp.asarray(uv), scales))
    assert f.shape == (n, 16)
    assert np.all(np.abs(f) <= 1.0 + 1e-6)


@given(
    st.integers(1, 4096),
    st.floats(1e-6, 1e3, allow_nan=False),
    st.sampled_from(["adam", "lbfgs"]),
    st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_config_override_roundtrip(batch, lr, opt, rica):
    """Arbitrary typed overrides parse back to the exact values."""
    from lshm_tpu.config import _apply_overrides, preset

    cfg = _apply_overrides(preset("full_khm"), [
        f"data.batch_size={batch}",
        f"optim.adam_lr={lr!r}",
        f"optim.optimizer={opt}",
        f"model.rica={rica}",
    ])
    assert cfg.data.batch_size == batch
    assert np.isclose(cfg.optim.adam_lr, lr)
    assert cfg.optim.optimizer == opt
    assert cfg.model.rica is rica


def test_config_override_none_typed_fields():
    """None-default fields coerce from literals: bool/none/number, not raw strings
    (a raw 'false' string would be truthy)."""
    from lshm_tpu.config import _apply_overrides, preset

    for raw, want in [("true", True), ("false", False), ("none", None),
                      ("auto", None)]:
        cfg = _apply_overrides(preset("full_khm"), [f"data.device_decode={raw}"])
        assert cfg.data.device_decode is want, (raw, cfg.data.device_decode)
    cfg = _apply_overrides(preset("full_khm_lbfgs"),
                           ["train.admm_unroll_lbfgs=false"])
    assert cfg.train.admm_unroll_lbfgs is False


@given(st.integers(2, 12))
@settings(max_examples=10, deadline=None)
def test_line_graph_edges_symmetric_closure(nstat):
    """For every cross-correlation edge (a, b) built from a full baseline set, the
    reverse (b, a) is also present, and self-loops exist for every baseline."""
    from itertools import combinations_with_replacement

    from lshm_tpu.graph.build import line_graph_edges

    baselines = np.array(list(combinations_with_replacement(range(nstat), 2)))
    ei = line_graph_edges(baselines)
    pairs = set(map(tuple, ei.T))
    for nb in range(len(baselines)):
        assert (nb, nb) in pairs
    for a, b in pairs:
        assert (b, a) in pairs
