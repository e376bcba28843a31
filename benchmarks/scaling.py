"""Batch-size scaling study for the flagship ADMM train step.

Sweeps the patch-batch size at fixed reference dimensions and records per-chip
throughput.  Finding (see scaling_report.json): the per-iteration time is nearly FLAT
from ~96 to 1408 patches — the step is dispatch-bound, not FLOP-bound, on this
relay-attached chip — so throughput grows linearly with batch until HBM OOMs at 1536.

Each batch size is measured in its OWN subprocess: compiling additional executables in
a live process degrades later measurements (and this backend's run-to-run drift reaches
+-50%, so only same-run rows are strictly comparable).

Usage: python benchmarks/scaling.py [--out benchmarks/scaling_report.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (batch, remat); 1536 OOMs even rematerialized
CONFIGS = ((12, False), (48, False), (96, False), (192, False), (384, False),
           (420, False), (768, True), (1024, True), (1280, True), (1408, True))
NADMM = 10


def measure(batch: int, steps: int = 10, reps: int = 4, remat: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from lshm_tpu.config import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig
    from lshm_tpu.models import CascadedAE
    from lshm_tpu.train import LossWeights, init_train_state, make_train_step

    nbase = max(batch // 4, 1)
    cfg = Config(
        data=DataConfig(batch_size=nbase, patch_size=128),
        model=ModelConfig(latent_dim=224, latent_dim_1d=16, num_clusters=10, rica=True,
                          khm_backend="xla"),
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
    ap.add_argument("--one", default=None, help="internal: 'batch,remat' subprocess mode")
    args = ap.parse_args()
    if args.one:
        b, r = args.one.split(",")
        print(json.dumps(measure(int(b), remat=r == "1")))
        return
    rows = []
    for b, r in CONFIGS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", f"{b},{int(r)}"],
            capture_output=True, text=True, timeout=1800,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        if line:
            row = json.loads(line)
            rows.append(row)
            print(json.dumps(row), flush=True)
        else:
            rows.append({"batch_patches": b, "remat": r, "failed": True})
            print(f"FAIL batch={b}: {proc.stderr[-200:]}", flush=True)

    import jax

    report = {
        "device": str(jax.devices()[0]),
        "note": ("per-iteration time is nearly flat across 96-1408 patches "
                 "(dispatch-bound step); throughput scales linearly with batch until "
                 "HBM OOMs at 1536; each row measured in an isolated subprocess"),
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
