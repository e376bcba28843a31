"""A/B: host-decode vs device-decode training input pipeline, end to end.

The recipe run (benchmarks/recipe_run_report.json) showed the flagship TRAINING
loop is bound by the host->device link on this tunneled attachment: each decoded
f32 minibatch is ~110 MB at ~46 MB/s (benchmarks/eval_pipeline_report.json
measures the link), dwarfing the ~10 ms/ADMM-iter device compute.  The eval path
already ships raw int8 and decodes on device for 4.4x; this script measures the
same move for training (DataConfig.device_decode,
lshm_tpu/data/device_decode.py::device_decode_train).

Method: identical Trainer runs (same seed, same synthetic SAP, flagship dims,
Adam, bfloat16, 12 baselines x 35 patches, nadmm=10) with device_decode False
then True; steady per-iter wall from the logger's timestamped records (each
record's loss was fetched to host one step delayed — a value-dependent sync, so
the loop cannot run ahead; drop the first two records for compile+warmup).

Run (TPU):  python benchmarks/input_pipeline_ab.py --write-report
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

REPORT = os.path.join(HERE, "input_pipeline_ab.json")


def run_one(cfg, device_decode: bool) -> dict:
    from lshm_tpu.train.trainer import Trainer
    from lshm_tpu.utils.metrics import MetricLogger

    cfg = cfg.replace(data=dataclasses.replace(cfg.data,
                                               device_decode=device_decode))
    logger = MetricLogger(echo=False)
    trainer = Trainer(cfg, logger)
    t0 = time.perf_counter()
    trainer.run()
    wall = time.perf_counter() - t0
    hist = logger.history
    nadmm = cfg.train.admm_iters
    row = {
        "device_decode": device_decode,
        "iters": len(hist),
        "wall_sec_incl_compile": wall,
        "final_loss": hist[-1]["loss"] if hist else None,
    }
    if len(hist) >= 4:
        dt = hist[-1]["t"] - hist[1]["t"]
        per_iter = dt / (len(hist) - 2)
        row["steady_sec_per_iter"] = per_iter
        row["steady_sec_per_admm_iter"] = per_iter / nadmm
        row["steady_patches_per_sec"] = hist[1].get("patches", 0) * nadmm / per_iter
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=14)
    ap.add_argument("--write-report", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    plat = os.environ.get("LSHM_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from lshm_tpu.config import preset
    from lshm_tpu.data.synthetic import write_synthetic_h5

    workdir = args.out or tempfile.mkdtemp(prefix="lshm_dd_ab_")
    data_dir = os.path.join(workdir, "data")
    # the recipe's SAP geometry: 384x512 -> 5x7 = 35 patches/baseline, batch 420
    write_synthetic_h5(os.path.join(data_dir, "L000001.MS_extract.h5"),
                       nstations=12, ntime=384, nfreq=512, seed=0)

    cfg = preset("full_khm")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, data_dir=data_dir, batch_size=12),
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
        train=dataclasses.replace(cfg.train, num_epochs=1,
                                  iters_per_epoch=args.iters, admm_iters=10,
                                  checkpoint_dir="", save_every=0, log_every=1),
    )

    rows = [run_one(cfg, dd) for dd in (False, True)]
    speedup = None
    if rows[0].get("steady_sec_per_iter") and rows[1].get("steady_sec_per_iter"):
        speedup = rows[0]["steady_sec_per_iter"] / rows[1]["steady_sec_per_iter"]
    report = {
        "device": str(jax.devices()[0]),
        "backend": jax.default_backend(),
        "compute_dtype": cfg.model.compute_dtype,
        "batch": {"baselines": cfg.data.batch_size, "patches": 420,
                  "admm_iters": cfg.train.admm_iters},
        "decoded_f32_minibatch_mb": 420 * 128 * 128 * 4 * 4 / 1e6,
        "raw_int8_minibatch_mb": 12 * 384 * 512 * 4 * 2 / 1e6,
        "runs": rows,
        "steady_speedup_device_decode": speedup,
        "date": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(report, indent=1), flush=True)
    if args.write_report:
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
