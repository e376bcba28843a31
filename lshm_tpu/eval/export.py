"""Serving export: serialize the trained cascade forward to a portable StableHLO
artifact (jax.export) with the parameters baked in.

The reference has no serving story — inference means re-running the training scripts'
Python against four ``.model`` files.  Here one self-contained artifact carries the
compiled-IR forward (patches, uv) -> (xrecon, Mu, cluster distances); any JAX process —
no model code, no checkpoint — can deserialize and call it, and the StableHLO can also
be fed to non-JAX runtimes that consume it.

By default the batch dimension is exported symbolically so one artifact serves any
batch size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def export_forward(
    model,
    params,
    patch_size: int = 128,
    num_channels: int = 4,
    order: int = 4,
    batch_size: int | None = None,
    platforms: tuple[str, ...] | None = None,
) -> bytes:
    """Serialize ``(x [N, P, P, C], uv [N, 2]) -> (xrecon, Mu, dists [N, K])`` with
    params baked in.  ``batch_size=None`` exports a symbolic batch dimension."""
    from jax import export as jexport

    from lshm_tpu.losses import pairwise_sq_dists

    M = params["params"]["khm"]["M"]

    def forward(x, uv):
        out = model.apply(params, x, uv)
        d2 = pairwise_sq_dists(out.Mu, M)
        if order % 2 == 0:
            dists = d2 ** (order // 2)
        else:
            dists = jnp.sqrt(d2 + 1e-30) ** order
        return out.xrecon, out.Mu, dists

    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch_size
    x_spec = jax.ShapeDtypeStruct((b, patch_size, patch_size, num_channels), jnp.float32)
    uv_spec = jax.ShapeDtypeStruct((b, 2), jnp.float32)
    kwargs = {"platforms": platforms} if platforms else {}
    exp = jexport.export(jax.jit(forward), **kwargs)(x_spec, uv_spec)
    return bytes(exp.serialize())


def load_exported(blob: bytes):
    """Deserialize an exported forward; returns a callable (x, uv) -> (xrecon, Mu, dists)."""
    from jax import export as jexport

    exp = jexport.deserialize(blob)
    return exp.call
