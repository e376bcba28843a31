"""Composed flagship A/B for the fused Pallas 2D encoder head (VERDICT r4 item 2).

Times the full jitted ADMM train step (Adam path, nadmm=10) at flagship dimensions
with ``ModelConfig.pallas_head`` off (XLA conv emitter, the round-3 headline path) and
on (lshm_tpu/kernels/conv2d_outer.py: conv0 + ELU + conv1 + ELU in one VMEM pass with
a rematerializing custom-VJP backward).  Same-session control, two-point host-fetch
timing (benchmarks/decompose.time_fn) — the only measurement that has ever predicted
the headline here (see PERF_NOTES round-3 lessons: op-level probes composed negative
three times).

Usage: python benchmarks/pallas_head_ab.py [--batch 420] [--dtype bfloat16_full]
       [--only off,on] [--group 4]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402
import jax  # noqa: E402
from decompose import time_fn  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=420)
    ap.add_argument("--dtype", default="bfloat16_full")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from lshm_tpu.models import CascadedAE
    from lshm_tpu.train import LossWeights, init_train_state, make_train_step

    batch, nbase = args.batch, max(args.batch // 35, 1)
    base_cfg, _, x, uv, key = bench._flagship_setup(
        batch, nbase, compute_dtype=args.dtype)
    w = LossWeights()

    def step_for(pallas_head: bool):
        cfg = dataclasses.replace(
            base_cfg, model=dataclasses.replace(base_cfg.model,
                                                pallas_head=pallas_head))
        model = CascadedAE(cfg=cfg.model)
        state, tx = init_train_state(model, cfg, key, x, uv)
        step = jax.jit(make_train_step(model, tx, cfg, num_groups=nbase,
                                       donate=False, jit=False))

        def run(xb):
            _, metrics = step(state, xb, uv, w)
            return metrics["loss"]
        return run

    sel = (args.only.split(",") if args.only else ["off", "on"])
    for name in sel:
        fn = step_for(name == "on")
        try:
            r = time_fn(fn, (x,))
            r["sec_per_admm_iter"] = r["sec_per_call"] / base_cfg.train.admm_iters
            r["patches_per_sec"] = batch / r["sec_per_admm_iter"]
        except Exception as e:  # pragma: no cover
            r = {"error": repr(e)[:300]}
        print(json.dumps({"variant": f"pallas_head_{name}", "batch": batch,
                          "dtype": args.dtype, **r}), flush=True)


if __name__ == "__main__":
    main()
