"""Flagship-dims sharded L-BFGS compile check on real TPU (VERDICT r4 item 5).

The CPU dryrun (``__graft_entry__.dryrun_multichip``) certifies the sharded
L-BFGS path at REDUCED dims (latent 32/8) because 8 virtual devices on a 1-core
host cannot compile the flagship program in budget.  This script closes the
residual risk: it builds a ``jax.sharding.Mesh`` over the real chip(s), jits
``train_step_sharded`` around the flagship L-BFGS step (latent 224/16, K=10,
RICA, bf16 closure, scan-lowered ADMM loop — exactly the full_khm_lbfgs preset
semantics; reference training mode: src/kharmonic_lofar.py:93,131-202), compiles
it under GSPMD, executes ONE step, and records the result.

Run (TPU): python benchmarks/flagship_shard_compile.py [--nadmm 2] [--write-report]
The slow TPU-gated test (tests/test_flagship_shard.py) runs the same path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

REPORT = os.path.join(HERE, "flagship_shard_report.json")


def run_check(nadmm: int = 2, batch: int = 420, nbase: int = 12) -> dict:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from lshm_tpu.config import (
        Config, DataConfig, LBFGSConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from lshm_tpu.models import CascadedAE
    from lshm_tpu.train import (
        LossWeights, init_lbfgs_train_state, make_lbfgs_train_step,
    )
    from lshm_tpu.train.parallel import (
        make_mesh, replicate_state, shard_batch, train_step_sharded,
    )

    cfg = Config(
        data=DataConfig(batch_size=nbase, patch_size=128),
        model=ModelConfig(latent_dim=224, latent_dim_1d=16, num_clusters=10,
                          rica=True, compute_dtype="bfloat16"),
        optim=OptimConfig(
            optimizer="lbfgs",
            lbfgs=LBFGSConfig(history_size=7, max_iter=4, line_search=True,
                              batch_mode=True),
        ),
        train=TrainConfig(admm_iters=nadmm, admm_unroll_lbfgs=False),
    )
    model = CascadedAE(cfg=cfg.model)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, 128, 128, 4), jnp.float32)
    uv = jnp.repeat(
        jax.random.normal(jax.random.fold_in(key, 1), (nbase, 2)),
        batch // nbase, axis=0,
    )
    mesh = make_mesh((-1,))
    state = init_lbfgs_train_state(model, cfg, jax.random.fold_in(key, 2), x, uv)
    state = replicate_state(mesh, state)
    x, uv = shard_batch(mesh, x, uv)
    step = train_step_sharded(
        make_lbfgs_train_step(model, cfg, num_groups=nbase, donate=False, jit=False),
        mesh, donate=False,
    )
    w = LossWeights()
    t0 = time.perf_counter()
    compiled = step.lower(state, x, uv, w).compile()
    compile_sec = time.perf_counter() - t0
    state, m = compiled(state, x, uv, w)
    # honest completion: fetch a value that depends on the step's result
    loss = float(jax.device_get(m["loss"][-1]))
    return {
        "ok": bool(loss == loss),     # finite/NaN check folded below
        "devices": [str(d) for d in jax.devices()],
        "mesh_shape": [len(jax.devices())],
        "backend": jax.default_backend(),
        "latent_dim": cfg.model.latent_dim,
        "latent_dim_1d": cfg.model.latent_dim_1d,
        "compute_dtype": cfg.model.compute_dtype,
        "nadmm": nadmm,
        "batch": batch,
        "compile_sec": compile_sec,
        "loss_after_one_step": loss,
        "func_evals": int(jax.device_get(state.opt_state.func_evals)),
        "date": time.strftime("%Y-%m-%d"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nadmm", type=int, default=2)
    ap.add_argument("--batch", type=int, default=420)
    ap.add_argument("--write-report", action="store_true")
    args = ap.parse_args()
    r = run_check(args.nadmm, args.batch)
    import math

    r["ok"] = math.isfinite(r["loss_after_one_step"]) and r["func_evals"] > 0
    print(json.dumps(r, indent=1), flush=True)
    if args.write_report:
        with open(REPORT, "w") as f:
            json.dump(r, f, indent=1)
    sys.exit(0 if r["ok"] else 1)


if __name__ == "__main__":
    main()
