"""Batch-size scaling study for the flagship ADMM train step — HONEST timing.

Sweeps the patch-batch size at fixed reference dimensions and records per-chip
throughput using the same completion-forcing two-point timing as bench.py (host
scalar fetch per measurement; the round-2 block_until_ready numbers were dispatch
rates — see VERDICT.md round 2).  Every row also records implied MFU from the
compiled executable's XLA cost analysis; rows with MFU > 1.0 are marked invalid.

Rows run in ONE process (the persistent compile cache plus AOT compilation keep them
independent), the report is written incrementally after every row, and a per-row
failure (OOM, relay error) records a failed row and continues.

Usage: python benchmarks/scaling.py [--out benchmarks/scaling_report.json]
       [--dtype float32] [--batches 12,96,420,768]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: shared honest-timing helpers)
import jax  # noqa: E402

# (batch, remat).  Under the unrolled ADMM loop even batch 1408 fits WITHOUT remat
# (scaling_noremat.json: 768 -> 32.5k, 1408 -> 31.7k patches/s; remat costs ~17%),
# so the default sweep is remat-free; pass --remat on to study the remat tax.
CONFIGS = ((12, False), (96, False), (420, False), (768, False), (1408, False))
NADMM = 10


def measure(batch: int, remat: bool = False, dtype: str = "float32") -> dict:
    from lshm_tpu.train import LossWeights, init_train_state, make_train_step

    nbase = max(batch // 4, 1)
    cfg, model, x, uv, key = bench._flagship_setup(
        batch, nbase, remat=remat, compute_dtype=dtype
    )
    state, tx = init_train_state(model, cfg, key, x, uv)
    step_fn = make_train_step(model, tx, cfg, num_groups=nbase, donate=False,
                              jit=False)
    w = LossWeights()
    t0 = time.perf_counter()
    compiled = jax.jit(step_fn).lower(state, x, uv, w).compile()
    compile_sec = time.perf_counter() - t0
    flops = bench._cost_flops(compiled)
    state, m = compiled(state, x, uv, w)
    bench._fetch_scalar(m)
    r, _ = bench._measure_two_point(compiled, state, x, uv, w, NADMM)
    row = {
        "batch_patches": batch,
        "remat": remat,
        "compute_dtype": dtype,
        "sec_per_admm_iter": r["sec_per_admm_iter"],
        "patches_per_sec": batch / r["sec_per_admm_iter"],
        "compile_sec": compile_sec,
        "fetch_rtt_sec": r["fetch_rtt_sec"],
    }
    if flops:
        row["mfu"] = flops / r["sec_per_step_call"] / bench.PEAK_FLOPS
        row["valid"] = row["mfu"] <= 1.0
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__), "scaling_report.json")
    )
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--batches", default=None,
                    help="comma list overriding the default sweep (remat auto >=768)")
    ap.add_argument("--remat", choices=["auto", "on", "off"], default="auto")
    args = ap.parse_args()
    def _remat(b):
        return {"auto": b >= 768, "on": True, "off": False}[args.remat]
    if args.batches:
        configs = [(int(b), _remat(int(b))) for b in args.batches.split(",")]
    elif args.remat != "auto":
        # --remat must also apply to the default sweep, not silently no-op
        configs = [(b, _remat(b)) for b, _ in CONFIGS]
    else:
        configs = list(CONFIGS)   # default sweep: remat-free (fits without it)

    rows = []

    def write():
        report = {
            "device": str(jax.devices()[0]),
            "timing": "two-point host-scalar-fetch (RTT-cancelled); see bench.py",
            "rows": rows,
        }
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)

    for b, r in configs:
        try:
            row = measure(b, remat=r, dtype=args.dtype)
        except Exception as e:  # OOM / relay error: record and continue
            row = {"batch_patches": b, "remat": r, "failed": True,
                   "error": repr(e)[:300]}
        rows.append(row)
        print(json.dumps(row), flush=True)
        write()


if __name__ == "__main__":
    main()
