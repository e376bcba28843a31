"""Op-level profile of the flagship ADMM step on the real TPU.

Captures a ``jax.profiler`` trace of N executions of the exact benched step
(bench.py flagship setup), then parses the perfetto trace to aggregate device-op
durations — the op-level answer to "where do the 14.4 ms/iter go" that the
component-level decomposition (decompose.py) cannot give.

Writes ``benchmarks/profile_report.json`` with the top ops by total device time.

Usage: python benchmarks/profile_step.py [--steps 3] [--dtype float32]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import jax  # noqa: E402


def capture(trace_dir: str, steps: int, dtype: str) -> dict:
    global _COMPILED_HLO
    from lshm_tpu.train import LossWeights, init_train_state, make_train_step

    cfg, model, x, uv, key = bench._flagship_setup(
        bench.BATCH_PATCHES, bench.NBASELINES, compute_dtype=dtype
    )
    state, tx = init_train_state(model, cfg, key, x, uv)
    step_fn = make_train_step(model, tx, cfg, num_groups=bench.NBASELINES,
                              donate=False, jit=False)
    w = LossWeights()
    compiled = jax.jit(step_fn).lower(state, x, uv, w).compile()
    try:  # keep the optimized HLO so top fusions can be annotated with their contents
        _COMPILED_HLO = compiled.as_text()
    except Exception:
        _COMPILED_HLO = None
    state, m = compiled(state, x, uv, w)        # warmup
    bench._fetch_scalar(m)

    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = compiled(state, x, uv, w)
    loss = bench._fetch_scalar(m)               # force completion inside the trace
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    return {"steps": steps, "wall_sec": wall, "final_loss": loss}


def parse_trace(trace_dir: str, top: int = 40) -> list[dict]:
    """Aggregate device-lane op durations from the perfetto trace."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name metadata mentions the TPU/device
    name_by_pid = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name_by_pid[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {pid for pid, n in name_by_pid.items()
                   if any(s in n.lower() for s in ("tpu", "device", "xla"))
                   and "host" not in n.lower()}
    agg: dict[str, list[float]] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0)          # microseconds
        if not dur:
            continue
        agg.setdefault(e["name"], []).append(dur)
    rows = [
        {"op": k, "total_us": round(sum(v), 1), "count": len(v),
         "mean_us": round(sum(v) / len(v), 2)}
        for k, v in agg.items()
    ]
    rows.sort(key=lambda r: -r["total_us"])
    return rows[:top]


_COMPILED_HLO: str | None = None


def annotate_rows(rows: list[dict], hlo: str | None) -> None:
    """Attach a one-line HLO summary to each top op: the interesting instructions
    (conv / dot / reduce / transpose / reverse / copy) inside its fused computation,
    with shapes — turning opaque ``fusion.7220`` names into actionable targets."""
    if not hlo:
        return
    import re

    # map "fusion.7220" -> called computation name, and computation name -> body
    call_of: dict[str, str] = {}
    for m in re.finditer(
        r"%?([\w.\-]+)\s*=\s*[\w\[\],{}\s/]*fusion\([^)]*\).*?calls=%?([\w.\-]+)", hlo
    ):
        call_of[m.group(1)] = m.group(2)
    bodies: dict[str, str] = {}
    for m in re.finditer(r"%?([\w.\-]+)\s*\([^)]*\)\s*->\s*[^{]+\{", hlo):
        start = m.end()
        depth, i = 1, start
        while depth and i < len(hlo):
            if hlo[i] == "{":
                depth += 1
            elif hlo[i] == "}":
                depth -= 1
            i += 1
        bodies[m.group(1)] = hlo[start:i]

    interesting = re.compile(
        r"=\s*((?:[a-z0-9]+\[[^\]]*\][^ ]*\s+)?(convolution|dot|reduce|transpose|"
        r"reverse|copy|concatenate|scatter|gather|exponential)\b[^\n]*)"
    )
    for r in rows:
        name = r.get("op", "")
        comp = call_of.get(name) or call_of.get(name.split("(")[0])
        body = bodies.get(comp) if comp else None
        if body is None:
            # non-fusion op: find its own defining line
            m = re.search(rf"%?{re.escape(name)}\s*=\s*([^\n]+)", hlo)
            if m:
                r["hlo"] = m.group(1)[:240]
            continue
        ops = []
        for m in interesting.finditer(body):
            line = " ".join(m.group(1).split())
            ops.append(line[:200])
            if len(ops) >= 4:
                break
        if ops:
            r["hlo"] = ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    # default follows the bench headline dtype so the profile matches what bench.py
    # measures; pass --dtype float32 for the control profile
    ap.add_argument("--dtype",
                    default=os.environ.get("LSHM_BENCH_DTYPE", "bfloat16_full"))
    ap.add_argument("--trace-dir", default="/tmp/lshm_profile")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "profile_report.json"))
    args = ap.parse_args()

    meta = capture(args.trace_dir, args.steps, args.dtype)
    try:
        rows = parse_trace(args.trace_dir)
        annotate_rows(rows, _COMPILED_HLO)
    except Exception as e:
        rows = [{"error": repr(e)[:300]}]
    report = {
        "unit": "device-op total microseconds over all profiled steps",
        "batch_patches": bench.BATCH_PATCHES,
        "nadmm": bench.NADMM,
        "compute_dtype": args.dtype,
        **meta,
        "top_ops": rows,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    for r in rows[:20]:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
