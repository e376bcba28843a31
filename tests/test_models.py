"""Model tests: shapes, parameter counts, uv embedding math, RICA semantics, cascade."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lshm_tpu.config import ModelConfig
from lshm_tpu.models import (
    AutoEncoder1D,
    AutoEncoder2D,
    CascadedAE,
    KHarmonicMeans,
    uv_harmonic_features,
)

SCALES = (1e-4, 1e-3, 1e-2, 1e-1)


def _nparams(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


def test_uv_harmonic_features_math():
    uv = np.array([[2.0, 3.0], [-1.0, 0.5]], dtype=np.float32)
    got = np.asarray(uv_harmonic_features(jnp.asarray(uv), SCALES))
    assert got.shape == (2, 16)
    # k = [s1*u, s1*v, s2*u, s2*v, ...]; output = [sin(k), cos(k)]
    k = np.concatenate([s * uv for s in SCALES], axis=1)
    want = np.concatenate([np.sin(k), np.cos(k)], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ae2d_shapes_and_param_count():
    m = AutoEncoder2D(latent_dim=224, channels=4, harmonic_scales=SCALES, rica=True)
    x = jnp.zeros((2, 128, 128, 4))
    uv = jnp.zeros((2, 2))
    params = m.init(jax.random.PRNGKey(0), x, uv)
    recon, mu = m.apply(params, x, uv)
    assert recon.shape == (2, 128, 128, 4)
    assert mu.shape == (2, 224)
    # ~1.25M params at L=224 with rica (SURVEY.md §2 model-size row)
    n = _nparams(params)
    assert 1.2e6 < n < 1.3e6, n


def test_ae2d_no_rica():
    m = AutoEncoder2D(latent_dim=32, channels=4, harmonic_scales=SCALES, rica=False)
    x = jnp.zeros((1, 128, 128, 4))
    uv = jnp.zeros((1, 2))
    params = m.init(jax.random.PRNGKey(0), x, uv)
    assert "fc2in" not in params["params"]
    recon, mu = m.apply(params, x, uv)
    assert recon.shape == x.shape and mu.shape == (1, 32)


def test_ae1d_shapes_and_param_count():
    m = AutoEncoder1D(latent_dim=16, channels=4, harmonic_scales=SCALES, rica=True)
    x = jnp.zeros((2, 128 * 128, 4))
    uv = jnp.zeros((2, 2))
    params = m.init(jax.random.PRNGKey(0), x, uv)
    recon, mu = m.apply(params, x, uv)
    assert recon.shape == (2, 128 * 128, 4)
    assert mu.shape == (2, 16)
    n = _nparams(params)
    # ~236k at Lt=16 (SURVEY.md §2)
    assert 2.2e5 < n < 2.5e5, n


def test_ae1d_no_rica_decode_works():
    """Reference defect: 1D AE non-RICA forward crashes (missing uv in decode,
    src/lofar_models.py:150). Ours must work."""
    m = AutoEncoder1D(latent_dim=8, channels=4, harmonic_scales=SCALES, rica=False)
    x = jnp.zeros((1, 128 * 128, 4))
    uv = jnp.zeros((1, 2))
    params = m.init(jax.random.PRNGKey(0), x, uv)
    recon, mu = m.apply(params, x, uv)
    assert recon.shape == x.shape


def test_rica_latent_is_sparse_intermediate():
    """With RICA, returned latent = elu(fc2in(encode(...))) and decode sees
    elu(fc2out(latent)) — verify by monkey-patching zeros into fc2out."""
    m = AutoEncoder2D(latent_dim=16, channels=4, harmonic_scales=SCALES, rica=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 4))
    uv = jnp.ones((1, 2))
    params = m.init(jax.random.PRNGKey(0), x, uv)
    _, mu1 = m.apply(params, x, uv)
    # zero fc2out -> decode input becomes elu(0)=0 but the returned latent is unchanged
    p2 = jax.tree_util.tree_map(lambda a: a, params)
    p2 = {"params": dict(p2["params"])}
    p2["params"]["fc2out"] = jax.tree.map(jnp.zeros_like, params["params"]["fc2out"])
    recon2, mu2 = m.apply(p2, x, uv)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), rtol=1e-6)


def test_khm_module():
    m = KHarmonicMeans(latent_dim=8, num_clusters=4, order=4)
    X = jax.random.normal(jax.random.PRNGKey(0), (10, 8))
    params = m.init(jax.random.PRNGKey(1), X)
    M = params["params"]["M"]
    assert M.shape == (4, 8)
    # init is uniform [0, 1) like the reference's torch.rand (src/lofar_models.py:197)
    assert float(M.min()) >= 0.0 and float(M.max()) < 1.0
    loss = m.apply(params, X)
    assert np.isfinite(float(loss))
    sim = m.apply(params, method=m.cluster_similarity)
    assert np.isfinite(float(sim))
    dist = m.apply(params, X, method=m.distances)
    assert dist.shape == (4,)
    lab = m.apply(params, X, method=m.assign)
    assert lab.shape == (10,) and set(np.asarray(lab)) <= set(range(4))


@pytest.mark.parametrize("fourier", [False, True])
def test_cascade_outputs(fourier):
    cfg = ModelConfig(
        latent_dim=32, latent_dim_1d=8, num_clusters=4, rica=True,
        fourier_variant=fourier, latent_dim_fourier=16,
    )
    m = CascadedAE(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 128, 4))
    uv = jnp.ones((2, 2))
    params = m.init(jax.random.PRNGKey(1), x, uv)
    out = m.apply(params, x, uv)
    assert out.x1.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(out.x11), np.asarray((x - out.x1) / 2), rtol=1e-5
    )
    assert out.Mu.shape == (2, cfg.total_latent_dim)
    if fourier:
        assert out.yf_in.shape == (2, 128, 128, 8)
        assert out.yf_out.shape == (2, 128, 128, 8)
    else:
        assert out.x2.shape == x.shape and out.x3.shape == x.shape
        np.testing.assert_allclose(
            np.asarray(out.xrecon), np.asarray(out.x1 + out.x2 + out.x3), rtol=1e-5
        )


def test_cascade_freq_axis_transpose_roundtrip():
    """x3 must be the freq-major AE's output transposed back: check orientation by
    feeding an impulse and confirming shapes/transposes are consistent."""
    cfg = ModelConfig(latent_dim=16, latent_dim_1d=8, num_clusters=3, rica=True)
    m = CascadedAE(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 128, 4))
    uv = jnp.ones((1, 2))
    params = m.init(jax.random.PRNGKey(3), x, uv)
    out = m.apply(params, x, uv)
    # manual recompute of x3 from the freq-major path
    x11 = np.asarray(out.x11)
    iy2 = jnp.asarray(np.swapaxes(x11, 1, 2).reshape(1, 128 * 128, 4))
    yyF, muF = m.apply(params, iy2, uv, method=lambda mdl, a, b: mdl.aeF(a, b))
    x3 = np.swapaxes(np.asarray(yyF).reshape(1, 128, 128, 4), 1, 2)
    np.testing.assert_allclose(np.asarray(out.x3), x3, rtol=1e-5, atol=1e-6)
    # atol for the fused grouped-conv path's float reassociation (~4e-7)
    np.testing.assert_allclose(np.asarray(out.muF), np.asarray(muF), rtol=1e-5,
                               atol=1e-6)


def test_fft2_shifted_matches_numpy():
    from lshm_tpu.models.cascade import fft2_shifted

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    got = np.asarray(fft2_shifted(jnp.asarray(x)))
    xf = np.fft.fftshift(np.fft.fft2(x, axes=(1, 2), norm="ortho"), axes=(1, 2))
    want = np.concatenate([xf.real, xf.imag], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_dual_ae1d_matches_unfused():
    """fuse_1d (both 1D AEs as one grouped-conv stack) is bit-for-bit the same math
    as two separate AE calls, for rica on/off, with an identical param tree."""
    import dataclasses

    import jax

    for rica in (True, False):
        cfg_f = ModelConfig(latent_dim=16, latent_dim_1d=8, num_clusters=3,
                            rica=rica, fuse_1d=True)
        cfg_u = dataclasses.replace(cfg_f, fuse_1d=False)
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (2, 128, 128, 4), jnp.float32)
        uv = jax.random.normal(jax.random.fold_in(k, 1), (2, 2))
        m_f, m_u = CascadedAE(cfg=cfg_f), CascadedAE(cfg=cfg_u)
        p = m_u.init(k, x, uv)
        assert jax.tree.structure(p) == jax.tree.structure(m_f.init(k, x, uv))
        a, b = m_u.apply(p, x, uv), m_f.apply(p, x, uv)
        for name in ("x1", "x2", "x3", "xrecon", "Mu"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
                atol=2e-5, rtol=1e-5, err_msg=f"{name} rica={rica}",
            )


def test_fast_conv1d_rewrites_match_flax():
    """The stride-4 rewrites (packed-view conv backward + Dense-as-ConvTranspose;
    ModelConfig.fast_conv1d, default OFF as a measured in-graph negative) must be
    exactly equivalent to the flax ops: same param tree, same forward, same grads."""
    import numpy as np

    from lshm_tpu.models.autoencoders import AutoEncoder1D

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16384, 4))
    uv = jax.random.normal(jax.random.PRNGKey(1), (2, 2))
    slow = AutoEncoder1D(latent_dim=16, fast=False)
    fast = AutoEncoder1D(latent_dim=16, fast=True)
    p_slow = slow.init(jax.random.PRNGKey(2), x, uv)
    p_fast = fast.init(jax.random.PRNGKey(2), x, uv)
    assert jax.tree_util.tree_structure(p_slow) == jax.tree_util.tree_structure(p_fast)
    for a, b in zip(jax.tree.leaves(p_slow), jax.tree.leaves(p_fast)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ya, mua = slow.apply(p_slow, x, uv)
    yb, mub = fast.apply(p_slow, x, uv)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mua), np.asarray(mub), rtol=1e-5, atol=1e-6)

    def loss(params, mod):
        y, mu = mod.apply(params, x, uv)
        return jnp.sum(y * y) + jnp.sum(mu)

    ga = jax.grad(loss)(p_slow, slow)
    gb = jax.grad(loss)(p_slow, fast)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5


def test_packed_conv2d_ops_match_flax():
    """The space-to-depth packed ops (conv2d_s2_packed / convt2d_s2_packed) must be
    bit-level-equivalent (to float tolerance) to the strided flax ops they rewrite."""
    import numpy as np
    from flax import linen as nn

    from lshm_tpu.models.autoencoders import conv2d_s2_packed, convt2d_s2_packed

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 16, 16, 4))
    conv = nn.Conv(8, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))
    p = conv.init(jax.random.PRNGKey(1), x)
    ref = conv.apply(p, x)
    got = conv2d_s2_packed(x, p["params"]["kernel"]) + p["params"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    z = jax.random.normal(jax.random.fold_in(key, 2), (3, 8, 8, 6))
    tconv = nn.ConvTranspose(4, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)))
    pt = tconv.init(jax.random.PRNGKey(3), z)
    reft = tconv.apply(pt, z)
    gott = convt2d_s2_packed(z, pt["params"]["kernel"]) + pt["params"]["bias"]
    np.testing.assert_allclose(np.asarray(gott), np.asarray(reft), rtol=1e-5, atol=1e-5)


def test_packed_conv2d_ae_matches_flax():
    """AutoEncoder2D with packed=n (ModelConfig.packed_conv2d) must have the same
    param tree, forward, and gradients as the strided default, for every depth."""
    import numpy as np

    from lshm_tpu.models.autoencoders import AutoEncoder2D

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 128, 4))
    uv = jax.random.normal(jax.random.PRNGKey(1), (2, 2))
    base = AutoEncoder2D(latent_dim=32, packed=0)
    p = base.init(jax.random.PRNGKey(2), x, uv)
    ya, mua = base.apply(p, x, uv)

    for depth in (1, 2, 6):
        packed = AutoEncoder2D(latent_dim=32, packed=depth)
        p2 = packed.init(jax.random.PRNGKey(2), x, uv)
        assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        yb, mub = packed.apply(p, x, uv)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=1e-5, atol=1e-5, err_msg=f"packed={depth}")
        np.testing.assert_allclose(np.asarray(mua), np.asarray(mub),
                                   rtol=1e-5, atol=1e-5, err_msg=f"packed={depth}")

    def loss(params, mod):
        y, mu = mod.apply(params, x, uv)
        return jnp.sum(y * y) + jnp.sum(mu)

    ga = jax.grad(loss)(p, base)
    gb = jax.grad(loss)(p, AutoEncoder2D(latent_dim=32, packed=2))
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5


def test_pallas_head_ae_matches_flax():
    """AutoEncoder2D with pallas_head=True (the fused VMEM kernel for the two
    outermost encoder stages, interpret mode off-TPU) must have the same param tree,
    forward, and gradients as the strided default."""
    import numpy as np

    from lshm_tpu.models.autoencoders import AutoEncoder2D

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 128, 4))
    uv = jax.random.normal(jax.random.PRNGKey(1), (2, 2))
    base = AutoEncoder2D(latent_dim=32, pallas_head=False)
    fused = AutoEncoder2D(latent_dim=32, pallas_head=True)
    p = base.init(jax.random.PRNGKey(2), x, uv)
    p2 = fused.init(jax.random.PRNGKey(2), x, uv)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ya, mua = base.apply(p, x, uv)
    yb, mub = fused.apply(p, x, uv)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mua), np.asarray(mub), rtol=1e-5, atol=1e-5)

    def loss(params, mod):
        y, mu = mod.apply(params, x, uv)
        return jnp.sum(y * y) + jnp.sum(mu)

    ga = jax.grad(loss)(p, base)
    gb = jax.grad(loss)(p, fused)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-5


def test_custom_elu_matches_jax_nn_elu():
    """The custom-JVP ELU (standalone select fusions removed on TPU) must match
    jax.nn.elu in values and gradients, including at extreme inputs."""
    import numpy as np

    from lshm_tpu.models.autoencoders import elu

    x = jnp.asarray(np.random.RandomState(0).randn(4096).astype(np.float32) * 10)
    np.testing.assert_array_equal(np.asarray(elu(x)), np.asarray(jax.nn.elu(x)))

    f = lambda e: lambda v: jnp.sum(e(v) * jnp.sin(v))   # non-trivial cotangent
    ga = jax.grad(f(elu))(x)
    gb = jax.grad(f(jax.nn.elu))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-6, atol=1e-6)

    xe = jnp.asarray([1e30, -1e30, 0.0, 700.0, -700.0], jnp.float32)
    ve, ge = elu(xe), jax.grad(lambda v: jnp.sum(elu(v)))(xe)
    assert np.all(np.isfinite(np.asarray(ve))) and np.all(np.isfinite(np.asarray(ge)))
    np.testing.assert_array_equal(np.asarray(ge), np.asarray([1, 0, 1, 1, 0], np.float32))


def test_enc_head_prime_batch_pads():
    """enc_head with a prime batch > G must NOT silently degrade to a G=1 grid
    (ADVICE r4): the batch is zero-padded up to a multiple of g and sliced back,
    with forward and weight gradients identical to the naive XLA conv head."""
    import numpy as np

    from lshm_tpu.kernels.conv2d_outer import enc_head
    from lshm_tpu.models.autoencoders import elu

    k = jax.random.PRNGKey(0)
    B, P, C, F0, F1 = 11, 32, 4, 8, 12          # 11 prime: pads to 20 with g=10
    x = jax.random.normal(k, (B, P, P, C))
    w0 = jax.random.normal(jax.random.fold_in(k, 1), (4, 4, C, F0)) * 0.2
    b0 = jax.random.normal(jax.random.fold_in(k, 2), (F0,)) * 0.1
    w1 = jax.random.normal(jax.random.fold_in(k, 3), (4, 4, F0, F1)) * 0.2
    b1 = jax.random.normal(jax.random.fold_in(k, 4), (F1,)) * 0.1

    def ref(x, w0, b0, w1, b1):
        conv = lambda v, w: jax.lax.conv_general_dilated(
            v, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return elu(conv(elu(conv(x, w0) + b0), w1) + b1)

    ya = enc_head(x, w0, b0, w1, b1, interpret=True)
    yb = ref(x, w0, b0, w1, b1)
    assert ya.shape == (B, P // 4, P // 4, F1)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=2e-5, atol=2e-5)

    def loss(fn):
        return lambda w0, b0, w1, b1: jnp.sum(fn(x, w0, b0, w1, b1) ** 2)

    ga = jax.grad(loss(lambda *a: enc_head(*a, interpret=True)), argnums=(0, 1, 2, 3))(
        w0, b0, w1, b1)
    gb = jax.grad(loss(ref), argnums=(0, 1, 2, 3))(w0, b0, w1, b1)
    for a, b in zip(ga, gb):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-5
