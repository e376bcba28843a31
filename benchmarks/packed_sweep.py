"""Composed-step sweep of ModelConfig.packed_conv2d (space-to-depth 2D convs).

Measures the flagship ADMM step (bench.py machinery: two-point host-fetch timing,
MFU-validated) at each packing depth, same session, depth 0 first as the control.
Writes benchmarks/packed_conv2d_report.json incrementally (a relay hang loses only
the in-flight row).

Usage: python benchmarks/packed_sweep.py [--depths 0,1,2,3] [--dtype bfloat16_full]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

REPORT = os.path.join(_REPO, "benchmarks", "packed_conv2d_report.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depths", default="0,1,2,3")
    ap.add_argument("--dtype", default="bfloat16_full")
    ap.add_argument("--batch", type=int, default=420)
    ap.add_argument("--nbase", type=int, default=12)
    args = ap.parse_args()

    import bench

    report = {
        "what": "flagship ADMM step vs ModelConfig.packed_conv2d "
                "(space-to-depth packed outer 2D conv stages)",
        "dtype": args.dtype,
        "batch": args.batch,
        "timing_method": "two-point host-scalar-fetch (RTT-cancelled)",
        "rows": [],
    }
    for depth in [int(d) for d in args.depths.split(",")]:
        os.environ["LSHM_BENCH_PACKED"] = str(depth)
        t0 = time.perf_counter()
        try:
            d = bench.measure_ours(args.dtype, batch=args.batch, nbase=args.nbase)
            row = {
                "packed": depth,
                "patches_per_sec": d["patches_per_sec"],
                "sec_per_admm_iter": d["sec_per_admm_iter"],
                "mfu": d.get("mfu"),
                "compile_sec": d["compile_sec"],
                "final_loss": d["final_loss"],
            }
            if d.get("mfu") and d["mfu"] > 1.0:
                # the numbers are by definition bogus — do not let them leak into
                # anything reading the report downstream
                row = {"packed": depth,
                       "REFUSED": "implied MFU > 1 — measurement bug",
                       "refused_mfu": d["mfu"]}
        except Exception as e:  # noqa: BLE001 — record the failure row and continue
            row = {"packed": depth, "error": repr(e)[:300]}
        row["wall_sec"] = round(time.perf_counter() - t0, 1)
        report["rows"].append(row)
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(row), flush=True)
    os.environ.pop("LSHM_BENCH_PACKED", None)   # never leak into a later bench run


if __name__ == "__main__":
    main()
