"""XLA TPU flag sweep over the flagship ADMM step (honest two-point timing).

Each candidate flag set runs ``bench.py --only headline`` in a fresh subprocess with
``XLA_FLAGS`` extended, so every row is an isolated compile + measurement using the
same completion-forcing timing the headline uses (see bench.py docstring; never
`block_until_ready` on this attachment).  The report is written incrementally after
every row; rows that fail (unknown flag, relay error, OOM) are recorded and skipped.

Rationale: every structural rewrite measured on this model (custom VJPs, packed
stride-4 convs, grouped 1D fusion, Dense-as-ConvTranspose) lost to XLA's own
lowering (benchmarks/PERF_NOTES.md), so the remaining cheap lever is giving the XLA
TPU backend different cost-model/fusion budgets and letting it re-schedule.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPORT = os.path.join(_REPO, "benchmarks", "xla_flag_report.json")

# Candidate single-chip flag sets. Unknown/rejected flags fail fast and are recorded.
CANDIDATES: list[tuple[str, str]] = [
    ("baseline", ""),
    # scoped vmem: a larger scratch budget lets the fusion pass build deeper fusions
    ("vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem_32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    # latency-hiding scheduler: mostly for collectives but also reorders copies
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    # let the scheduler use more host memory for a better schedule
    ("sched_mem", "--xla_tpu_memory_limit_slack_in_bytes=1073741824"),
]


def run_one(name: str, flags: str, timeout_s: int = 900) -> dict:
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    # flag sets change generated code but not the cache key inputs XLA tracks for
    # some debug options — use a per-row cache dir to avoid cross-contamination
    env["LSHM_JAX_CACHE_DIR"] = os.path.join(_REPO, ".jax_cache", f"flags_{name}")
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(_REPO, "bench.py"), "--only", "headline"],
            capture_output=True, text=True, timeout=timeout_s, env=env, cwd=_REPO,
        )
        tail = (r.stdout or "").strip().splitlines()
        row: dict = {"name": name, "flags": flags, "rc": r.returncode,
                     "wall_s": round(time.time() - t0, 1)}
        if r.returncode == 0 and tail:
            try:
                row.update(json.loads(tail[-1]))
            except ValueError:            # non-JSON trailing line: record, don't abort
                row["stdout_tail"] = tail[-1][-300:]
        else:
            row["stderr_tail"] = (r.stderr or "")[-300:]
        return row
    except subprocess.TimeoutExpired:
        return {"name": name, "flags": flags, "rc": None,
                "error": f"timeout {timeout_s}s", "wall_s": round(time.time() - t0, 1)}


def main():
    rows = []
    report = {
        "recorded_at": time.strftime("%Y-%m-%d"),
        "timing_method": "two_point_host_fetch (bench.py --only headline per flag set)",
        "rows": rows,
    }
    for name, flags in CANDIDATES:
        print(f"[{name}] {flags or '(none)'} ...", flush=True)
        row = run_one(name, flags)
        rows.append(row)
        pps = row.get("patches_per_sec")
        print(f"[{name}] -> {pps if pps else row}", flush=True)
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=1)
    ok = [r for r in rows if r.get("patches_per_sec")]
    if ok:
        best = max(ok, key=lambda r: r["patches_per_sec"])
        report["best"] = {"name": best["name"], "flags": best["flags"],
                          "patches_per_sec": best["patches_per_sec"]}
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=1)
        print("best:", report["best"], flush=True)


if __name__ == "__main__":
    main()
