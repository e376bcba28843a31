"""End-to-end LSHM-TPU walkthrough — the replacement for the reference's Demo.ipynb /
EvaluateClusters.ipynb notebooks, as a runnable script.

Covers: synthetic data -> full-cascade ADMM training (Adam, then the published ramp with
L-BFGS) -> clustering evaluation (distance matrix, t-SNE, agglomerative, montages) ->
line-graph GNN over the learned latents -> RICA dictionary learning.

Run:  python examples/walkthrough.py --out /tmp/lshm_demo [--epochs 2]
Everything is CPU-runnable (slowly); on a TPU host it runs as-is, faster.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # Same hermetic-run override the CLI honors: LSHM_PLATFORM=cpu pins the backend
    # via jax.config (reliable even where a sitecustomize already chose a platform).
    plat = os.environ.get("LSHM_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/lshm_demo")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--small", action="store_true", default=True,
                    help="small latent dims for a quick run")
    ap.add_argument("--fourier", action="store_true",
                    help="legacy notebook pipeline: second 2D AE on the FFT residual")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import dataclasses

    from lshm_tpu.config import (
        LBFGSConfig, ModelConfig, OptimConfig, RampStage, TrainConfig, preset,
    )
    from lshm_tpu.data.synthetic import write_synthetic_h5
    from lshm_tpu.train.trainer import Trainer
    from lshm_tpu.utils.metrics import MetricLogger

    # ---- 1. synthetic observation ---------------------------------------------------
    data_dir = os.path.join(args.out, "data")
    h5 = write_synthetic_h5(
        os.path.join(data_dir, "L000001.MS_extract.h5"),
        nstations=5, ntime=192, nfreq=192, seed=3,
    )
    print(f"[1/5] synthetic observation: {h5}")

    # ---- 2. configure the full cascade + published ramp ------------------------------
    cfg = preset("fourier_cascade" if args.fourier else "full_khm")
    if args.small:
        model_cfg = ModelConfig(latent_dim=32, latent_dim_1d=8, latent_dim_fourier=8,
                                num_clusters=4, fourier_variant=args.fourier)
    else:
        model_cfg = cfg.model
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, data_dir=data_dir, batch_size=3),
        model=model_cfg,
        optim=OptimConfig(
            optimizer="adam",
            lbfgs=LBFGSConfig(max_iter=2, history_size=5),
            group_schedule=(),                    # set ("ae2d","ae1d","khm") to alternate
        ),
        train=TrainConfig(
            num_epochs=args.epochs + 1, iters_per_epoch=args.iters, admm_iters=3,
            checkpoint_dir=os.path.join(args.out, "ckpt"),
            # the published recipe: low weights + Adam first, then ramp + L-BFGS
            # (reference README.md:24-30)
            ramp=(
                RampStage(epochs=args.epochs, alpha=0.001, beta=0.001, gamma=0.001,
                          optimizer="adam"),
                RampStage(epochs=1, alpha=0.01, beta=0.01, gamma=0.01,
                          optimizer="lbfgs"),
            ),
        ),
    )

    # ---- 3. train --------------------------------------------------------------------
    logger = MetricLogger(jsonl_path=os.path.join(args.out, "train_log.jsonl"), echo=True)
    trainer = Trainer(cfg, logger)
    trainer.run()
    print(f"[3/5] trained; final metrics: {logger.summary()}")

    # ---- 4. clustering evaluation ----------------------------------------------------
    from lshm_tpu.eval import evaluate_sap

    res = evaluate_sap(
        trainer.model, trainer.params, h5, "0",
        num_hard_clusters=3, out_dir=os.path.join(args.out, "eval"), montages=True,
    )
    print(f"[4/5] eval: {res.X.shape[1]} baselines, "
          f"hard labels {sorted(set(res.labels.tolist()))}; artifacts in {args.out}/eval")

    # ---- 5. graph nets + RICA over the learned latents --------------------------------
    from lshm_tpu.graph import build_line_graph_data, draw_graph, train_line_graph

    gdata = build_line_graph_data(trainer.model, trainer.params, h5, "0")
    draw_graph(gdata, os.path.join(args.out, "line_graph.png"),
               title="baseline line graph")
    _, _, losses = train_line_graph(gdata, hidden=4, epochs=50)
    print(f"[5/5] line-graph GNN: loss {losses[0]:.4f} -> {losses[-1]:.4f}; "
          f"structure PNG in {args.out}/line_graph.png")

    import jax
    import numpy as np

    from lshm_tpu.data import MinibatchSampler
    from lshm_tpu.rica import RICAConfig, RICADictionaryLearner

    mb = MinibatchSampler([h5], ["0"], cfg.data, seed=0).sample()
    X = RICADictionaryLearner.patches_to_columns(mb.x)
    learner = RICADictionaryLearner(
        RICAConfig(input_dim=X.shape[0], dict_size=16,
                   solver=LBFGSConfig(max_iter=3, history_size=3, batch_mode=True)),
    )
    m = learner.fit_minibatch(X, jax.random.PRNGKey(0))
    learner.save_atom_images(os.path.join(args.out, "rica"), channels=4,
                             patch=cfg.data.patch_size)
    print(f"      RICA dictionary: loss {m['loss']:.4f}; atoms in {args.out}/rica")


if __name__ == "__main__":
    main()
