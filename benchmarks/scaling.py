"""Batch-size scaling study for the flagship ADMM train step.

Sweeps the patch-batch size at fixed reference dimensions and records per-chip
throughput, showing where the step transitions from latency-bound to compute-bound and
what per-chip batch feeds the MXU best (informs the data-parallel per-device batch).

Usage: python benchmarks/scaling.py [--out benchmarks/scaling_report.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCHES = (12, 48, 96, 192, 384)
REMAT_BATCHES = (768,)      # OOMs without remat; 1536 exceeds HBM even rematerialized
NADMM = 10


def measure(batch: int, steps: int = 10, reps: int = 3, remat: bool = False) -> dict:
    from lshm_tpu.config import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig
    from lshm_tpu.models import CascadedAE
    from lshm_tpu.train import LossWeights, init_train_state, make_train_step

    nbase = max(batch // 4, 1)
    cfg = Config(
        data=DataConfig(batch_size=nbase, patch_size=128),
        model=ModelConfig(latent_dim=224, latent_dim_1d=16, num_clusters=10, rica=True,
                          khm_backend="auto"),
        optim=OptimConfig(optimizer="adam", adam_lr=1e-4),
        train=TrainConfig(admm_iters=NADMM, remat=remat),
    )
    model = CascadedAE(cfg=cfg.model)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, 128, 128, 4), jnp.float32)
    uv = jnp.repeat(
        jax.random.normal(jax.random.fold_in(key, 1), (nbase, 2)),
        batch // nbase, axis=0,
    )
    state, tx = init_train_state(model, cfg, jax.random.fold_in(key, 2), x, uv)
    step = make_train_step(model, tx, cfg, num_groups=nbase, donate=True)
    w = LossWeights()
    state, m = step(state, x, uv, w)
    jax.block_until_ready(m["loss"])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, x, uv, w)
        jax.block_until_ready(m["loss"])
        best = min(best, (time.perf_counter() - t0) / (steps * NADMM))
    return {
        "batch_patches": batch,
        "sec_per_admm_iter": best,
        "patches_per_sec": batch / best,
        "remat": remat,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__), "scaling_report.json")
    )
    args = ap.parse_args()
    rows = []
    for b in BATCHES:
        r = measure(b)
        rows.append(r)
        print(json.dumps(r), flush=True)
    for b in REMAT_BATCHES:
        r = measure(b, steps=5, remat=True)
        rows.append(r)
        print(json.dumps(r), flush=True)
    report = {"device": str(jax.devices()[0]), "rows": rows}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
