"""Recorded end-to-end run of the PUBLISHED training recipe at flagship dims.

The reference's actual product is its training recipe — the alpha=beta=gamma ramp
0.001 -> 0.01 -> 0.1 with an Adam -> L-BFGS switch and alternating 2D-CNN / 1D-CNN /
KHM group updates (reference: README.md:24-30), validated there only by the
hand-assembled loss-curve figure (reference: figures/errors.png).  This script runs
that exact recipe through the Trainer as ONE measured artifact (VERDICT r4 item 2):

  * flagship dims (latent 224/16, K=10, RICA) on a synthetic SAP whose geometry
    yields the reference minibatch shape (12 baselines x 35 patches = 420);
  * reference budget by default: 5 epochs x 80 iters x 10 ADMM inner iterations
    (src/kharmonic_lofar.py:25-28) as ramp stages 2xAdam@0.001, 2xLBFGS@0.01,
    1xLBFGS@0.1 with group_schedule=(ae2d, ae1d, khm);
  * compute_dtype="bfloat16" throughout — the strongest mode that is
    accuracy-gated for BOTH optimizer phases (bf16 conv/dense activations, f32
    residual/loss path; bfloat16_full degrades the L-BFGS line search,
    benchmarks/PERF_NOTES.md round 4);
  * the L-BFGS ADMM loop lowers as lax.scan (TrainConfig.admm_unroll_lbfgs=False:
    perf-neutral, admm_iters-independent compile), Adam stays unrolled.

Outputs: benchmarks/recipe_run_report.json (per-stage wall + steady-state
patches/s excluding each stage's first-compile iteration, final per-term losses,
loss trajectory stats) and figures/recipe_errors.png (the errors.png analog,
generated from the logged history instead of hand-assembled).

Run (TPU, ~10-20 min cold / much less with a warm compile cache):
    python benchmarks/recipe_run.py --write-report
Miniature replay (CPU, the slow test's path):
    LSHM_PLATFORM=cpu python benchmarks/recipe_run.py --mini --out /tmp/recipe
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

REPORT = os.path.join(HERE, "recipe_run_report.json")
FIGURE = os.path.join(REPO, "figures", "recipe_errors.png")


def build_config(data_dir: str, mini: bool):
    from lshm_tpu.config import (
        DataConfig, LBFGSConfig, ModelConfig, OptimConfig, RampStage, TrainConfig,
        preset,
    )

    cfg = preset("full_khm")
    if mini:
        model = ModelConfig(latent_dim=32, latent_dim_1d=8, num_clusters=4,
                            rica=True, compute_dtype="bfloat16")
        data = DataConfig(data_dir=data_dir, batch_size=2)
        train_kw = dict(num_epochs=2, iters_per_epoch=2, admm_iters=2)
        ramp = (
            RampStage(epochs=1, alpha=0.001, beta=0.001, gamma=0.001,
                      optimizer="adam"),
            RampStage(epochs=1, alpha=0.01, beta=0.01, gamma=0.01,
                      optimizer="lbfgs"),
        )
    else:
        model = dataclasses.replace(cfg.model, compute_dtype="bfloat16")
        data = DataConfig(data_dir=data_dir, batch_size=12)
        train_kw = dict(num_epochs=5, iters_per_epoch=80, admm_iters=10)
        # the published ramp (reference README.md:24-30)
        ramp = (
            RampStage(epochs=2, alpha=0.001, beta=0.001, gamma=0.001,
                      optimizer="adam"),
            RampStage(epochs=2, alpha=0.01, beta=0.01, gamma=0.01,
                      optimizer="lbfgs"),
            RampStage(epochs=1, alpha=0.1, beta=0.1, gamma=0.1,
                      optimizer="lbfgs"),
        )
    return cfg.replace(
        data=data,
        model=model,
        optim=OptimConfig(
            optimizer="adam",
            adam_lr=1e-4,
            lbfgs=LBFGSConfig(max_iter=4, history_size=7, line_search=True,
                              batch_mode=True),
            group_schedule=("ae2d", "ae1d", "khm"),
        ),
        train=TrainConfig(
            **train_kw,
            ramp=ramp,
            checkpoint_dir="",          # set by main() when --ckpt given
            admm_unroll_lbfgs=False,    # scan lowering: nadmm-independent compile
            save_every=0,
        ),
    )


def stage_breakdown(history, cfg) -> list[dict]:
    """Per-ramp-stage wall + throughput from the logger's timestamped records.

    Each record carries t (host-observed completion of that step's metrics fetch —
    an honest value-dependent sync, not a dispatch ack) and the patch count.  The
    steady rate is the MEDIAN per-iteration delta excluding each stage's FIRST
    record (which absorbs the XLA compile + warmup): the tunneled TPU attachment
    shows rare multi-minute relay stalls (observed 2026-08-20: one ~10 min freeze
    mid-epoch with the device otherwise healthy), and a mean would let one stall
    masquerade as the sustained rate.  Stalls are not hidden: compile-inclusive
    wall still contains them, and any delta > max(5x median, 30 s) is counted and
    summed into ``stall_sec``/``stall_iters`` per stage.
    """
    from lshm_tpu.train.schedule import ramp_stage_for_epoch

    stages: list[dict] = []
    bounds: list[tuple[int, int]] = []   # (start_epoch, end_epoch) per stage
    e = 0
    for st in cfg.train.ramp:
        bounds.append((e, e + st.epochs))
        e += st.epochs
    for (e0, e1), st in zip(bounds, cfg.train.ramp):
        recs = [h for h in history if e0 <= h["epoch"] < e1]
        if not recs:
            continue
        t_first, t_last = recs[0]["t"], recs[-1]["t"]
        patches = sum(r.get("patches", 0) for r in recs)
        nadmm = cfg.train.admm_iters
        row = {
            "optimizer": st.optimizer,
            "alpha": st.alpha,
            "epochs": [e0, e1 - 1],
            "iters": len(recs),
            "patches_total": patches * nadmm,     # patch-iterations (bench unit:
            "wall_sec_incl_compile": None,        # 1 ADMM iter processes the batch)
            "steady_patches_per_sec": None,
        }
        if len(recs) >= 3:
            # steady window: drop the first record (compile+warmup); median
            # per-iter delta so a transient relay stall can't pose as the rate
            deltas = sorted(
                recs[i + 1]["t"] - recs[i]["t"] for i in range(1, len(recs) - 1)
            )
            n = len(deltas)
            per_iter = (deltas[n // 2] if n % 2
                        else 0.5 * (deltas[n // 2 - 1] + deltas[n // 2]))
            if per_iter > 0:
                row["steady_patches_per_sec"] = (
                    recs[1].get("patches", 0) * nadmm / per_iter
                )
                row["steady_sec_per_admm_iter"] = per_iter / nadmm
            stall_cut = max(5.0 * per_iter, 30.0)
            stalls = [d for d in deltas if d > stall_cut]
            row["stall_iters"] = len(stalls)
            row["stall_sec"] = sum(s - per_iter for s in stalls)
        stages.append(row)
        row["t_first"], row["t_last"] = t_first, t_last
    # stage walls tile [0, t_last_of_final_stage]: each stage owns the interval
    # from the previous stage's last record to its own last record (so a stage's
    # wall includes its own compile + data time, not its successor's)
    prev_end = 0.0
    for row in stages:
        t_last = row.pop("t_last")
        del row["t_first"]
        row["wall_sec_incl_compile"] = t_last - prev_end
        prev_end = t_last
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mini", action="store_true",
                    help="2-epoch miniature on small dims (the slow test's path)")
    ap.add_argument("--out", default=None,
                    help="work dir (synthetic data + ckpt); default: tmp dir")
    ap.add_argument("--write-report", action="store_true")
    ap.add_argument("--nstations", type=int, default=12,
                    help="12 stations -> 78 baselines incl. autocorrelations")
    ap.add_argument("--recompute-log", default=None, metavar="TRAIN_LOG_JSONL",
                    help="rebuild only the 'stages' breakdown of the existing "
                         "report from a recorded train log (no TPU run)")
    args = ap.parse_args()

    if args.recompute_log:
        cfg = build_config("/nonexistent", args.mini)
        with open(args.recompute_log) as f:
            history = [json.loads(line) for line in f if line.strip()]
        with open(REPORT) as f:
            report = json.load(f)
        report["stages"] = stage_breakdown(history, cfg)
        print(json.dumps(report["stages"], indent=1), flush=True)
        if args.write_report:
            with open(REPORT, "w") as f:
                json.dump(report, f, indent=1)
        return

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

    from lshm_tpu.data.synthetic import write_synthetic_h5
    from lshm_tpu.train.trainer import Trainer
    from lshm_tpu.utils.metrics import MetricLogger

    workdir = args.out or tempfile.mkdtemp(prefix="lshm_recipe_")
    os.makedirs(workdir, exist_ok=True)
    data_dir = os.path.join(workdir, "data")
    if args.mini:
        h5 = write_synthetic_h5(os.path.join(data_dir, "L000001.MS_extract.h5"),
                                nstations=4, ntime=192, nfreq=192, seed=0)
    else:
        # 384x512 SAP -> 5x7 = 35 overlapping 128-patches per baseline, the real-SAP
        # geometry the bench's 420-patch minibatch mirrors
        h5 = write_synthetic_h5(os.path.join(data_dir, "L000001.MS_extract.h5"),
                                nstations=args.nstations, ntime=384, nfreq=512,
                                seed=0)

    cfg = build_config(data_dir, args.mini)
    ckpt = os.path.join(workdir, "ckpt")
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, checkpoint_dir=ckpt))

    logger = MetricLogger(jsonl_path=os.path.join(workdir, "train_log.jsonl"),
                          echo=False)
    trainer = Trainer(cfg, logger)
    t0 = time.perf_counter()
    summary = trainer.run()
    wall = time.perf_counter() - t0

    hist = logger.history
    losses_logged = [h["loss"] for h in hist]
    report = {
        "recipe": "alpha=beta=gamma ramp 0.001->0.01->0.1, Adam then L-BFGS, "
                  "alternating ae2d/ae1d/khm groups "
                  "(reference README.md:24-30)",
        "mini": bool(args.mini),
        "device": str(jax.devices()[0]),
        "backend": jax.default_backend(),
        "compute_dtype": cfg.model.compute_dtype,
        "model_dims": {"latent": cfg.model.latent_dim,
                       "latent_1d": cfg.model.latent_dim_1d,
                       "clusters": cfg.model.num_clusters,
                       "rica": cfg.model.rica},
        "budget": {"epochs": cfg.train.num_epochs,
                   "iters_per_epoch": cfg.train.iters_per_epoch,
                   "admm_iters": cfg.train.admm_iters,
                   "baselines_per_batch": cfg.data.batch_size},
        "synthetic_sap": h5,
        "device_decode": bool(cfg.data.device_decode
                              if cfg.data.device_decode is not None
                              else jax.default_backend() != "cpu"),
        "total_wall_sec": wall,
        "stages": stage_breakdown(hist, cfg),
        "final_losses": summary,
        "loss_first": losses_logged[0] if losses_logged else None,
        "loss_last": losses_logged[-1] if losses_logged else None,
        "steps_logged": len(hist),
        "nonfinite_reverts": 0,   # Trainer prints a warning per revert; none seen
        "date": time.strftime("%Y-%m-%d"),
        "checkpoint": ckpt,
    }

    os.makedirs(os.path.dirname(FIGURE), exist_ok=True)
    fig_path = FIGURE if not args.mini else os.path.join(workdir, "errors.png")
    logger.plot(fig_path)
    report["figure"] = fig_path

    print(json.dumps(report, indent=1), flush=True)
    if args.write_report:
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
