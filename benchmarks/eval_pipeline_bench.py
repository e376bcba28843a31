"""End-to-end eval-pipeline measurement (VERDICT r3 weak #5 / r4 item 6).

Measures, on a synthetic SAP at flagship model dims:

  * host decode throughput of the eval batch reader (native C++ fused path and the
    numpy oracle path) — the producer-side ceiling;
  * end-to-end ``baseline_distance_matrix`` wall time, serial (decode_lookahead=0)
    vs pipelined (background-thread decode + one-chunk-late result fetch, the
    default) — end-to-end must track max(decode, device) instead of their sum.

The device forward was measured at ~275k patches/s (BENCH_r03 eval secondary) vs
~8k patches/s host decode, so on this one-core host the pipelined end-to-end rate
should sit within ~2x of the host-decode rate (the "decode-bound, not
decode-plus-device-bound" criterion).  Reference eval loop being replaced:
src/evaluate_clustering.py:75-119 (serial per-baseline reads + forwards).

Usage: python benchmarks/eval_pipeline_bench.py [--nstations 16] [--ntime 384]
       [--nfreq 384] [--bpb 8] [--write-report]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
REPORT = os.path.join(HERE, "eval_pipeline_report.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nstations", type=int, default=16,
                    help="16 stations -> 136 baselines incl. autocorrelations")
    ap.add_argument("--ntime", type=int, default=384)
    ap.add_argument("--nfreq", type=int, default=384)
    ap.add_argument("--bpb", type=int, default=8, help="baselines per device chunk")
    ap.add_argument("--write-report", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

    from lshm_tpu import native
    from lshm_tpu.config import ModelConfig
    from lshm_tpu.data.h5io import read_baselines_patches_batch, read_metadata
    from lshm_tpu.data.synthetic import write_synthetic_h5
    from lshm_tpu.eval import baseline_distance_matrix
    from lshm_tpu.models import CascadedAE

    report: dict = {
        "nstations": args.nstations, "ntime": args.ntime, "nfreq": args.nfreq,
        "baselines_per_batch": args.bpb, "device": str(jax.devices()[0]),
        "native_available": native.available(),
    }

    with tempfile.TemporaryDirectory() as tmp:
        h5 = write_synthetic_h5(os.path.join(tmp, "L000001.MS_extract.h5"),
                                nstations=args.nstations, ntime=args.ntime,
                                nfreq=args.nfreq, seed=0)
        nbase = read_metadata(h5, "0")[0]
        ids = list(range(nbase))
        chunks = [ids[s:s + args.bpb] for s in range(0, nbase, args.bpb)]

        # --- producer ceiling: decode-only sweeps over every chunk ------------------
        for label, use_native in [("native", True), ("numpy", False)]:
            if use_native and not native.available():
                continue
            # one untimed chunk warms the page cache / library load
            read_baselines_patches_batch(h5, "0", chunks[0], uvdist=True,
                                         use_native=use_native)
            t0 = time.perf_counter()
            total = 0
            for c in chunks:
                _, _, p, _ = read_baselines_patches_batch(h5, "0", c, uvdist=True,
                                                          use_native=use_native)
                total += p.shape[0]
            dt = time.perf_counter() - t0
            report[f"decode_{label}_patches_per_sec"] = total / dt
            report[f"decode_{label}_sec"] = dt
        report["patches_total"] = total

        # --- end-to-end distance matrix: serial vs pipelined ------------------------
        cfg = ModelConfig(latent_dim=224, latent_dim_1d=16, num_clusters=10, rica=True)
        model = CascadedAE(cfg=cfg)
        import jax.numpy as jnp

        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 128, 128, 4)), jnp.zeros((1, 2)))
        # warmup compiles the jitted feature extractor at the chunk shape (all chunks
        # share one trace: the tail chunk is padded)
        baseline_distance_matrix(model, params, h5, "0",
                                 baselines_per_batch=args.bpb,
                                 baseline_ids=chunks[0], decode_lookahead=0)
        # host->device link probe: decoded-f32-patch chunks vs raw-int8 chunks —
        # on a tunneled TPU attachment this link, not the decode or the forward,
        # can dominate end-to-end eval (the motivation for device_decode)
        ppb_probe = ((max(args.ntime, 128) - 128) // 64 + 1) * (
            (max(args.nfreq, 128) - 128) // 64 + 1)
        f32_chunk = np.random.rand(
            args.bpb * ppb_probe, 128, 128, 4).astype(np.float32)
        i8_chunk = np.random.randint(
            -127, 127, (args.bpb, args.ntime, args.nfreq, 4, 2), dtype=np.int8)
        for name, buf in (("f32_patches", f32_chunk), ("int8_raw", i8_chunk)):
            d = jax.device_put(buf); float(jax.device_get(d.reshape(-1)[0]))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                d = jax.device_put(buf)
                float(jax.device_get(d.reshape(-1)[0]))   # completion-forcing
                ts.append(time.perf_counter() - t0)
            mb = buf.nbytes / 1e6
            report[f"h2d_{name}_mb"] = mb
            report[f"h2d_{name}_sec_per_chunk"] = min(ts)
            report[f"h2d_{name}_mb_per_sec"] = mb / min(ts)

        for label, la, dd in [("serial", 0, False), ("pipelined", 2, False),
                              ("serial_devdec", 0, True),
                              ("pipelined_devdec", 2, True)]:
            # warm the path's own compile before its timed window
            baseline_distance_matrix(model, params, h5, "0",
                                     baselines_per_batch=args.bpb,
                                     baseline_ids=chunks[0], decode_lookahead=0,
                                     device_decode=dd)
            t0 = time.perf_counter()
            X, _ = baseline_distance_matrix(model, params, h5, "0",
                                            baselines_per_batch=args.bpb,
                                            decode_lookahead=la,
                                            device_decode=dd)
            dt = time.perf_counter() - t0
            report[f"e2e_{label}_sec"] = dt
            report[f"e2e_{label}_patches_per_sec"] = total / dt
        report["pipeline_speedup"] = (report["e2e_serial_sec"]
                                      / report["e2e_pipelined_sec"])
        report["device_decode_speedup"] = (
            report["e2e_pipelined_sec"] / report["e2e_pipelined_devdec_sec"])
        decode_rate = report.get("decode_native_patches_per_sec",
                                 report.get("decode_numpy_patches_per_sec"))
        # the done-criterion ratio: end-to-end vs the host-decode ceiling (1 core);
        # for the host-decode path the ceiling is the decode, for the device-decode
        # path the decode leaves the picture entirely (only raw reads + H2D remain)
        report["e2e_over_decode_ceiling"] = (
            report["e2e_pipelined_patches_per_sec"] / decode_rate)
        report["e2e_devdec_over_decode_ceiling"] = (
            report["e2e_pipelined_devdec_patches_per_sec"] / decode_rate)
        report["date"] = time.strftime("%Y-%m-%d")

    print(json.dumps(report, indent=1), flush=True)
    if args.write_report:
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
