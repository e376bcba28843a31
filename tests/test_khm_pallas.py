"""Pallas fused KHM kernel: forward and analytic-VJP parity with the XLA implementation
(interpret mode on CPU; the same kernels compile on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from lshm_tpu.kernels import khm_loss_fused
from lshm_tpu.losses import khm_loss


def _data(n=48, d=256, k=10, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)).astype(np.float32)
    M = rng.uniform(size=(k, d)).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(M)


def test_forward_matches_xla():
    X, M = _data()
    want = float(khm_loss(X, M, 4))
    got = float(khm_loss_fused(X, M, 4, force="interpret"))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_forward_p2():
    X, M = _data(n=16, d=128, k=4, seed=1)
    want = float(khm_loss(X, M, 2))
    got = float(khm_loss_fused(X, M, 2, force="interpret"))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gradients_match_xla():
    X, M = _data(n=24, d=128, k=6, seed=2)
    gx_want, gm_want = jax.grad(lambda x, m: khm_loss(x, m, 4), argnums=(0, 1))(X, M)
    gx, gm = jax.grad(
        lambda x, m: khm_loss_fused(x, m, 4, force="interpret"), argnums=(0, 1)
    )(X, M)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_want), rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_want), rtol=2e-4, atol=1e-8)


def test_tiled_grid_large_batch():
    """N=4096 spans 4 grid blocks of 1024: scalar loss and centroid grads must
    accumulate across sequential grid steps."""
    X, M = _data(n=4096, d=256, k=10, seed=5)
    want = float(khm_loss(X, M, 4))
    got = float(khm_loss_fused(X, M, 4, force="interpret"))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    gx_want, gm_want = jax.grad(lambda x, m: khm_loss(x, m, 4), argnums=(0, 1))(X, M)
    gx, gm = jax.grad(
        lambda x, m: khm_loss_fused(x, m, 4, force="interpret"), argnums=(0, 1)
    )(X, M)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_want), rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_want), rtol=2e-4, atol=1e-8)


def test_tiled_grid_ragged_tail():
    """N=2500 = 2 full blocks + a 452-row tail: padded rows must not contribute to the
    loss, e, dx, or the accumulated dm."""
    X, M = _data(n=2500, d=256, k=6, seed=6)
    want = float(khm_loss(X, M, 4))
    got = float(khm_loss_fused(X, M, 4, force="interpret"))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    gx_want, gm_want = jax.grad(lambda x, m: khm_loss(x, m, 4), argnums=(0, 1))(X, M)
    gx, gm = jax.grad(
        lambda x, m: khm_loss_fused(x, m, 4, force="interpret"), argnums=(0, 1)
    )(X, M)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_want), rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gm_want), rtol=2e-4, atol=1e-8)


def test_small_batch_unaligned():
    """N smaller than one sublane tile (rounds 5 -> block of 8): masking handles it."""
    X, M = _data(n=5, d=128, k=3, seed=7)
    want = float(khm_loss(X, M, 4))
    got = float(khm_loss_fused(X, M, 4, force="interpret"))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_odd_p_falls_back():
    X, M = _data(n=8, d=16, k=3, seed=3)
    got = float(khm_loss_fused(X, M, 3))
    want = float(khm_loss(X, M, 3))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_auto_dispatch_cpu_uses_xla():
    from lshm_tpu.kernels import khm_loss_pallas_available

    X, M = _data(n=8, d=16, k=3, seed=4)
    # on the CPU test backend the auto path must fall back, not crash
    val = float(khm_loss_fused(X, M, 4))
    assert np.isfinite(val)
    if jax.default_backend() != "tpu":
        assert not khm_loss_pallas_available()


def test_khm_fused_accepts_bf16_latents():
    """Under the bfloat16_full data path the latents arrive bf16; the fused backend
    must upcast (losses._f32 convention) so the Pallas custom VJP's f32 cotangents
    route through the cast instead of tripping custom_vjp's aval check."""
    X = jax.random.normal(jax.random.PRNGKey(0), (64, 16), jnp.bfloat16)
    M = jax.random.normal(jax.random.PRNGKey(1), (4, 16), jnp.float32)
    v16 = khm_loss_fused(X, M, 4, force="interpret")
    v32 = khm_loss_fused(X.astype(jnp.float32), M, 4, force="xla")
    assert abs(float(v16) - float(v32)) < 1e-4 * abs(float(v32)) + 1e-6
    g = jax.grad(lambda X: khm_loss_fused(X, M, 4, force="interpret"))(X)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
