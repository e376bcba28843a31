"""The full cascaded ADMM / augmented-Lagrangian training objective.

Reproduces the reference closure term-by-term (reference: src/kharmonic_lofar.py:132-182):

    loss0 = ||xrecon - x||^2 / numel                     total reconstruction
    loss1 = (y1 . (x - x1)   + rho/2 ||x - x1||^2) / numel     2D AE ADMM term
    loss2 = (y2 . (x11 - x2) + rho/2 ||x11 - x2||^2) / numel   time-axis 1D AE ADMM term
    loss3 = (y3 . (x11 - x3) + rho/2 ||x11 - x3||^2) / numel   freq-axis 1D AE ADMM term
    kdist = alpha * KHM clustering loss on Mu
    sim   = beta  * centroid contrastive penalty
    aug   = gamma * intra-baseline latent-agreement loss
    rica  = lambda * sum of mean log-cosh of the three sparse latents

with the Lagrange-multiplier update after each optimizer step:
    y_k <- y_k + rho * residual_k        (reference: src/kharmonic_lofar.py:186-202).

Everything is a pure function of (params, x, uv, duals, weights), so the whole ADMM inner
loop jits as one program — no per-term host sync, unlike the reference whose losses are
Python loops.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from lshm_tpu.losses import (
    admm_term,
    augmentation_loss,
    cluster_similarity_loss,
    khm_loss,
    mse_sum,
    rica_loss,
)


@struct.dataclass
class LossWeights:
    """Traced loss weights: changing a ramp stage does not trigger recompilation."""

    alpha: jnp.ndarray | float = 0.01
    beta: jnp.ndarray | float = 0.01
    gamma: jnp.ndarray | float = 0.01
    rho: jnp.ndarray | float = 1.0
    rica_lambda: jnp.ndarray | float = 0.01


@struct.dataclass
class Duals:
    """ADMM Lagrange multipliers, one per AE consistency constraint; reset to zero per
    minibatch (reference: src/kharmonic_lofar.py:128-130).

    For the legacy Fourier variant the second constraint lives in Fourier space where
    the residual has 2C channels (real+imag stacks), so ``y2`` is sized to the FULL
    Fourier residual (2 * numel) and ``y3`` is empty (there is no third AE).  The
    reference notebooks never define ADMM for that pipeline (Demo.ipynb cells 6 & 10
    are inference-only), so this is a specified deviation — see README deviations."""

    y1: jnp.ndarray
    y2: jnp.ndarray
    y3: jnp.ndarray

    @classmethod
    def zeros(cls, numel: int, dtype=jnp.float32, fourier: bool = False) -> "Duals":
        """Flat duals (the reference's representation, src/kharmonic_lofar.py:128-130)."""
        z = jnp.zeros((numel,), dtype)
        if fourier:
            return cls(y1=z, y2=jnp.zeros((2 * numel,), dtype),
                       y3=jnp.zeros((0,), dtype))
        return cls(y1=z, y2=z, y3=z)

    @classmethod
    def zeros_like(cls, x: jnp.ndarray, fourier: bool = False) -> "Duals":
        """Duals shaped like the residuals they multiply (same math as ``zeros`` —
        a dual is just a vector of numel Lagrange multipliers — but keeping the
        residual's own NHWC shape avoids a full relayout of each 110 MB-scale dual
        per ADMM term on TPU)."""
        z = jnp.zeros_like(x)
        if fourier:
            yf_shape = (*x.shape[:-1], 2 * x.shape[-1])
            return cls(y1=z, y2=jnp.zeros(yf_shape, x.dtype),
                       y3=jnp.zeros((0,), x.dtype))
        return cls(y1=z, y2=z, y3=z)


def cascade_objective(
    model,
    params,
    x: jnp.ndarray,
    uv: jnp.ndarray,
    duals: Duals,
    w: LossWeights,
    num_groups: int,
    use_rica: bool = True,
    khm_order: int = 4,
    khm_backend: str = "xla",
):
    """Returns (total_loss, metrics_dict). ``num_groups`` = number of baselines in the
    minibatch (augmentation groups are baseline-major contiguous).  ``khm_backend``
    selects the fused Pallas KHM kernel ("pallas"/"auto") or the XLA expression."""
    out = model.apply(params, x, uv)
    numel = x.size
    loss0 = mse_sum(out.xrecon, x) / numel
    loss1 = admm_term(duals.y1, x - out.x1, w.rho) / numel
    if out.yf_in is not None:
        # legacy Fourier variant: the second AE reconstructs the FFT features; its
        # consistency term constrains the FULL 2C-channel Fourier residual, normalized
        # by that residual's own numel (specified deviation — the reference notebooks
        # are inference-only and never define ADMM here).
        loss0 = loss0 + mse_sum(out.yf_out, out.yf_in) / out.yf_in.size
        loss2 = admm_term(duals.y2, out.yf_in - out.yf_out, w.rho) / out.yf_in.size
        loss3 = jnp.zeros(())
        latents = (out.mu, out.muT)
    else:
        loss2 = admm_term(duals.y2, out.x11 - out.x2, w.rho) / numel
        loss3 = admm_term(duals.y3, out.x11 - out.x3, w.rho) / numel
        latents = (out.mu, out.muT, out.muF)

    M = params["params"]["khm"]["M"]
    if khm_backend == "xla":
        kdist = w.alpha * khm_loss(out.Mu, M, khm_order)
    else:
        from lshm_tpu.kernels import khm_loss_fused

        force = None if khm_backend == "auto" else khm_backend
        kdist = w.alpha * khm_loss_fused(out.Mu, M, khm_order, force=force)
    sim = w.beta * cluster_similarity_loss(M)
    aug = w.gamma * augmentation_loss(out.Mu, num_groups)

    total = loss0 + loss1 + loss2 + loss3 + kdist + sim + aug
    metrics: dict[str, Any] = {
        "loss0": loss0, "loss1": loss1, "loss2": loss2, "loss3": loss3,
        "kdist": kdist, "sim": sim, "aug": aug,
    }
    if use_rica:
        rl = w.rica_lambda * rica_loss(*latents)
        total = total + rl
        metrics["rica"] = rl
    metrics["loss"] = total
    return total, metrics


def metrics_and_dual_update(
    model, params, x, uv, duals: Duals, w: LossWeights, num_groups: int,
    use_rica: bool = True, khm_order: int = 4, khm_backend: str = "xla",
) -> tuple[dict, Duals]:
    """One shared post-step forward pass producing BOTH the per-term metrics (at the
    post-step params, pre-update duals) and the Lagrange-dual update — the L-BFGS ADMM
    path uses this instead of two separate model.apply calls."""
    out = model.apply(params, x, uv)
    numel = x.size
    loss0 = mse_sum(out.xrecon, x) / numel
    loss1 = admm_term(duals.y1, x - out.x1, w.rho) / numel
    if out.yf_in is not None:
        loss0 = loss0 + mse_sum(out.yf_out, out.yf_in) / out.yf_in.size
        r2 = out.yf_in - out.yf_out
        loss2 = admm_term(duals.y2, r2, w.rho) / out.yf_in.size
        loss3 = jnp.zeros(())
        latents = (out.mu, out.muT)
        new_duals = Duals(
            y1=duals.y1 + w.rho * (x - out.x1).reshape(duals.y1.shape),
            y2=duals.y2 + w.rho * r2.reshape(duals.y2.shape),
            y3=duals.y3,
        )
    else:
        loss2 = admm_term(duals.y2, out.x11 - out.x2, w.rho) / numel
        loss3 = admm_term(duals.y3, out.x11 - out.x3, w.rho) / numel
        latents = (out.mu, out.muT, out.muF)
        new_duals = Duals(
            y1=duals.y1 + w.rho * (x - out.x1).reshape(duals.y1.shape),
            y2=duals.y2 + w.rho * (out.x11 - out.x2).reshape(duals.y2.shape),
            y3=duals.y3 + w.rho * (out.x11 - out.x3).reshape(duals.y3.shape),
        )

    M = params["params"]["khm"]["M"]
    if khm_backend == "xla":
        kdist = w.alpha * khm_loss(out.Mu, M, khm_order)
    else:
        from lshm_tpu.kernels import khm_loss_fused

        kdist = w.alpha * khm_loss_fused(
            out.Mu, M, khm_order, force=None if khm_backend == "auto" else khm_backend
        )
    sim = w.beta * cluster_similarity_loss(M)
    aug = w.gamma * augmentation_loss(out.Mu, num_groups)
    total = loss0 + loss1 + loss2 + loss3 + kdist + sim + aug
    metrics = {
        "loss0": loss0, "loss1": loss1, "loss2": loss2, "loss3": loss3,
        "kdist": kdist, "sim": sim, "aug": aug,
    }
    if use_rica:
        rl = w.rica_lambda * rica_loss(*latents)
        total = total + rl
        metrics["rica"] = rl
    metrics["loss"] = total
    return metrics, new_duals


def loss_from_outputs(
    out, M: jnp.ndarray, x: jnp.ndarray, duals: Duals, w: LossWeights,
    num_groups: int, use_rica: bool = True, khm_order: int = 4,
    khm_backend: str = "xla",
):
    """The objective as a pure function of the forward OUTPUTS (CascadeOutputs) and the
    centroids M — used by the fused train step, which differentiates this w.r.t.
    (out, M) and pulls the cotangents through one shared vjp of the forward.
    Must stay term-for-term identical to cascade_objective."""
    numel = x.size
    loss0 = mse_sum(out.xrecon, x) / numel
    loss1 = admm_term(duals.y1, x - out.x1, w.rho) / numel
    if out.yf_in is not None:
        loss0 = loss0 + mse_sum(out.yf_out, out.yf_in) / out.yf_in.size
        loss2 = admm_term(duals.y2, out.yf_in - out.yf_out, w.rho) / out.yf_in.size
        loss3 = jnp.zeros(())
        latents = (out.mu, out.muT)
    else:
        loss2 = admm_term(duals.y2, out.x11 - out.x2, w.rho) / numel
        loss3 = admm_term(duals.y3, out.x11 - out.x3, w.rho) / numel
        latents = (out.mu, out.muT, out.muF)

    if khm_backend == "xla":
        kdist = w.alpha * khm_loss(out.Mu, M, khm_order)
    else:
        from lshm_tpu.kernels import khm_loss_fused

        kdist = w.alpha * khm_loss_fused(
            out.Mu, M, khm_order, force=None if khm_backend == "auto" else khm_backend
        )
    sim = w.beta * cluster_similarity_loss(M)
    aug = w.gamma * augmentation_loss(out.Mu, num_groups)
    total = loss0 + loss1 + loss2 + loss3 + kdist + sim + aug
    metrics = {
        "loss0": loss0, "loss1": loss1, "loss2": loss2, "loss3": loss3,
        "kdist": kdist, "sim": sim, "aug": aug,
    }
    if use_rica:
        rl = w.rica_lambda * rica_loss(*latents)
        total = total + rl
        metrics["rica"] = rl
    metrics["loss"] = total
    return total, metrics


def dual_update_from_outputs(out, x: jnp.ndarray, duals: Duals, rho) -> Duals:
    """y_k <- y_k + rho * residual_k computed from an existing forward's outputs."""
    if out.yf_in is not None:
        r2 = out.yf_in - out.yf_out
        return Duals(
            y1=duals.y1 + rho * (x - out.x1).reshape(duals.y1.shape),
            y2=duals.y2 + rho * r2.reshape(duals.y2.shape),
            y3=duals.y3,
        )
    return Duals(
        y1=duals.y1 + rho * (x - out.x1).reshape(duals.y1.shape),
        y2=duals.y2 + rho * (out.x11 - out.x2).reshape(duals.y2.shape),
        y3=duals.y3 + rho * (out.x11 - out.x3).reshape(duals.y3.shape),
    )


def dual_update(model, params, x, uv, duals: Duals, rho) -> Duals:
    """y_k <- y_k + rho * residual_k with a fresh (post-step) forward pass
    (reference: src/kharmonic_lofar.py:186-202)."""
    out = model.apply(params, x, uv)
    if out.yf_in is not None:
        r2 = out.yf_in - out.yf_out
        return Duals(
            y1=duals.y1 + rho * (x - out.x1).reshape(duals.y1.shape),
            y2=duals.y2 + rho * r2.reshape(duals.y2.shape),
            y3=duals.y3,
        )
    return Duals(
        y1=duals.y1 + rho * (x - out.x1).reshape(duals.y1.shape),
        y2=duals.y2 + rho * (out.x11 - out.x2).reshape(duals.y2.shape),
        y3=duals.y3 + rho * (out.x11 - out.x3).reshape(duals.y3.shape),
    )
