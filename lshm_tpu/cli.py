"""Command-line interface.

The reference has no CLI — every experiment is a hand-edited script (SURVEY.md §5
"config/flag system: none").  Here:

    python -m lshm_tpu.cli synth --out data/            # write synthetic H5 fixture
    python -m lshm_tpu.cli train --data-dir data/ --preset full_khm \\
           --set train.num_epochs=2 --set data.batch_size=8
    python -m lshm_tpu.cli eval --data-dir data/ --ckpt checkpoints/ --out results/
    python -m lshm_tpu.cli import-torch --net net.model --net-t netT.model \\
           --net-f netF.model --khm khm.model --out checkpoints/
    python -m lshm_tpu.cli bench
"""

from __future__ import annotations

import argparse
import sys


def _add_set(p):
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VAL",
        help="config override, e.g. data.batch_size=4 or optim.optimizer=lbfgs",
    )


def cmd_synth(args):
    from lshm_tpu.data.synthetic import write_synthetic_h5

    path = write_synthetic_h5(
        f"{args.out}/L000001.MS_extract.h5",
        nstations=args.nstations, ntime=args.ntime, nfreq=args.nfreq, seed=args.seed,
    )
    print(f"wrote {path}")


def _build_config(args):
    import dataclasses

    from lshm_tpu.config import _apply_overrides, preset

    cfg = preset(args.preset)
    if getattr(args, "data_dir", None):
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, data_dir=args.data_dir))
    try:
        return _apply_overrides(cfg, args.set)
    except (AssertionError, ValueError, AttributeError) as e:
        sys.exit(f"error: bad --set override: {e}")


def cmd_train(args):
    from lshm_tpu.train.trainer import Trainer
    from lshm_tpu.utils.metrics import MetricLogger

    if args.coordinator or args.num_processes:
        from lshm_tpu.train.distributed import init_distributed

        n = init_distributed(args.coordinator, args.num_processes, args.process_id)
        if not args.quiet:
            print(f"distributed: {n} process(es)")
    cfg = _build_config(args)
    logger = MetricLogger(jsonl_path=args.log_jsonl, echo=not args.quiet)
    t = Trainer(cfg, logger, profile_dir=args.profile_dir)
    if not args.quiet and t.mesh is not None:
        print(f"mesh: {dict(t.mesh.shape)} over {len(t.mesh.devices.flat)} device(s)")
    if args.resume:
        t.load(cfg.train.checkpoint_dir)
    summary = t.run()
    print(f"done: {summary}")


def cmd_eval(args):
    from lshm_tpu.eval import evaluate_sap
    from lshm_tpu.data import scan_files
    from lshm_tpu.train.trainer import Trainer

    cfg = _build_config(args)
    t = Trainer(cfg)
    try:
        t.load(args.ckpt)
    except FileNotFoundError as e:
        sys.exit(f"error: no checkpoint found at {args.ckpt!r} ({e})")
    files, saps = scan_files(cfg.data.data_dir, cfg.data.file_pattern)
    if not files:
        sys.exit(f"no valid H5 data under {cfg.data.data_dir!r}")
    idx = args.sap_index % len(files)
    res = evaluate_sap(
        t.model, t.params, files[idx], saps[idx],
        patch_size=cfg.data.patch_size, num_channels=cfg.data.num_channels,
        order=cfg.model.khm_order, num_hard_clusters=args.hard_clusters,
        out_dir=args.out, montages=args.montages, recon_panels=args.recon_panels,
    )
    print(f"evaluated {res.X.shape[1]} baselines; "
          f"soft cluster histogram: {__import__('numpy').bincount(res.soft_assign).tolist()}")


def cmd_import_torch(args):
    from lshm_tpu.utils.checkpoint import save_checkpoint
    from lshm_tpu.utils.torch_import import (
        load_reference_checkpoints,
        load_reference_checkpoints_fourier,
    )

    if args.fnet:
        if args.net_t or args.net_f:
            sys.exit("error: pass either --fnet (legacy Fourier trio) or "
                     "--net-t/--net-f (current pipeline), not both")
        params = load_reference_checkpoints_fourier(args.net, args.fnet, args.khm,
                                                    rica=not args.no_rica)
    else:
        if not (args.net_t and args.net_f):
            sys.exit("error: --net-t and --net-f are required (or --fnet for the "
                     "legacy Fourier trio)")
        params = load_reference_checkpoints(args.net, args.net_t, args.net_f, args.khm,
                                            rica=not args.no_rica)
    save_checkpoint(args.out, {"params": params}, step=0,
                    extras={"source": "torch-reference",
                            "fourier_variant": bool(args.fnet)})
    print(f"imported reference checkpoints -> {args.out}")


def cmd_demo(args):
    """Render a synthetic fringe spectrogram as pseudocolor PNG — the equivalent of the
    reference's display_colors.py demo (reference: src/display_colors.py:27-51)."""
    import numpy as np

    from lshm_tpu.data.synthetic import synth_fringe
    from lshm_tpu.utils.rgb import channel_to_rgb, save_image_grid

    rng = np.random.default_rng(args.seed)
    uv_m = rng.uniform(-1e3, 1e3, size=2)
    vis = synth_fringe(rng, args.ntime, args.nfreq, uv_m, noise=0.05)
    # 4 channels: re/im of pols 0 and 3
    x = np.stack(
        [vis[:, :, 0, 0], vis[:, :, 0, 1], vis[:, :, 3, 0], vis[:, :, 3, 1]], axis=-1
    )
    save_image_grid([channel_to_rgb(x)], args.out)
    print(f"wrote {args.out}")


def cmd_graph(args):
    """Train a GNN classifier over the learned latents — the CLI form of the
    reference's train_graph.py (line graph) / train_graph_stat.py (station graph)."""
    import numpy as np

    from lshm_tpu.data import scan_files
    from lshm_tpu.data.h5io import read_metadata
    from lshm_tpu.graph import (
        build_line_graph_data,
        build_station_graph_data,
        station_graph_maps,
        train_line_graph,
    )
    from lshm_tpu.train.trainer import Trainer

    cfg = _build_config(args)
    t = Trainer(cfg)
    try:
        t.load(args.ckpt)
    except FileNotFoundError as e:
        sys.exit(f"error: no checkpoint found at {args.ckpt!r} ({e})")
    files, saps = scan_files(cfg.data.data_dir, cfg.data.file_pattern)
    if not files:
        sys.exit(f"no valid H5 data under {cfg.data.data_dir!r}")
    idx = args.sap_index % len(files)

    # a station "epoch" is a full graph rebuild (SAP read + forward sweep), far more
    # costly than a line-graph Adam epoch — so the defaults differ per kind
    if args.epochs is None:
        args.epochs = 200 if args.kind == "line" else 5

    if args.kind == "line":
        data = build_line_graph_data(
            t.model, t.params, files[idx], saps[idx],
            patch_size=cfg.data.patch_size, num_channels=cfg.data.num_channels,
            order=cfg.model.khm_order,
        )
        if args.plot:
            from lshm_tpu.graph import draw_graph

            print(f"wrote {draw_graph(data, args.plot, title='baseline line graph')}")
        _, _, losses = train_line_graph(data, hidden=args.hidden, epochs=args.epochs)
        print(f"line graph: {data.x.shape[0]} nodes, "
              f"{data.edge_index.shape[1]} edges; loss {losses[0]:.5f} -> {losses[-1]:.5f}")
    else:
        from lshm_tpu.graph import train_station_graph_epochs

        baselines_per_sap = [
            read_metadata(f, s, give_baselines=True)[0] for f, s in zip(files, saps)
        ]
        stations, bmap = station_graph_maps(baselines_per_sap)
        if args.plot:
            from lshm_tpu.graph import draw_graph

            data = build_station_graph_data(
                t.model, t.params, files[idx], saps[idx], stations, bmap,
                patch_size=cfg.data.patch_size, num_channels=cfg.data.num_channels,
                order=cfg.model.khm_order,
            )
            print(f"wrote {draw_graph(data, args.plot, title='station graph', directed=True)}")
        # per-epoch stochastic rebuild: each epoch draws a random SAP and a fresh
        # random patch per baseline (reference: src/train_graph_stat.py:161-268)
        _, _, losses = train_station_graph_epochs(
            t.model, t.params, files, saps, stations, bmap,
            epochs=args.epochs, steps_per_graph=args.steps_per_graph,
            patch_size=cfg.data.patch_size, num_channels=cfg.data.num_channels,
            order=cfg.model.khm_order,
        )
        print(f"station graph: {len(stations)} stations, {args.epochs} rebuilt "
              f"graphs x {args.steps_per_graph} steps; "
              f"loss {losses[0]:.5f} -> {losses[-1]:.5f}")


def cmd_rica(args):
    """RICA linear dictionary learning over spectrogram patches — the CLI form of the
    reference's rica_lofar.py script (reference: src/rica_lofar.py:44-104): alternate
    (a) an L-BFGS sparse-code solve for X = A S and (b) a dictionary ascent step, then
    render the learned atoms as one PNG grid."""
    import os

    import jax

    from lshm_tpu.config import DataConfig, LBFGSConfig
    from lshm_tpu.data import scan_files
    from lshm_tpu.data.sampler import MinibatchSampler
    from lshm_tpu.rica import RICAConfig, RICADictionaryLearner

    files, saps = scan_files(args.data_dir)
    if not files:
        sys.exit(f"no valid H5 data under {args.data_dir!r}")
    dcfg = DataConfig(
        data_dir=args.data_dir, batch_size=args.batch, patch_size=args.patch_size,
        num_channels=args.channels, uvdist=False,
    )
    sampler = MinibatchSampler(files, saps, dcfg, seed=args.seed)
    cfg = RICAConfig(
        input_dim=args.channels * args.patch_size * args.patch_size,
        dict_size=args.dict_size, l1_weight=args.l1, dict_lr=args.eta,
        solver=LBFGSConfig(lr=1.0, max_iter=args.solver_iters, history_size=7,
                           line_search=True, batch_mode=True),
    )
    learner = RICADictionaryLearner(cfg, seed=args.seed)
    key = jax.random.PRNGKey(args.seed)
    for i in range(args.iters):
        mb = sampler.sample()
        X = learner.patches_to_columns(mb.x)
        key, sub = jax.random.split(key)
        m = learner.fit_minibatch(X, sub)
        print(f"rica {i} loss {m['loss']:.6e} |dA| {m['dA_norm']:.6e}")
    os.makedirs(args.out, exist_ok=True)
    learner.save_atom_images(args.out, channels=args.channels, patch=args.patch_size)
    print(f"wrote {os.path.join(args.out, 'dictionary_atoms.png')} "
          f"({cfg.dict_size} atoms)")


def cmd_export(args):
    """Serialize the trained forward (params baked in) to a portable StableHLO
    artifact any JAX process can deserialize and call without model code."""
    from lshm_tpu.eval import export_forward
    from lshm_tpu.train.trainer import Trainer

    cfg = _build_config(args)
    t = Trainer(cfg)
    try:
        t.load(args.ckpt)
    except FileNotFoundError as e:
        sys.exit(f"error: no checkpoint found at {args.ckpt!r} ({e})")
    blob = export_forward(
        t.model, t.params,
        patch_size=cfg.data.patch_size, num_channels=cfg.data.num_channels,
        order=cfg.model.khm_order,
        batch_size=args.batch if args.batch > 0 else None,
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    shape = args.batch if args.batch > 0 else "symbolic"
    print(f"exported forward (batch={shape}) -> {args.out} ({len(blob)} bytes)")


def cmd_bench(args):
    import bench

    bench.main()


def main(argv=None):
    # Hermetic-run overrides (useful where shell env loses to a sitecustomize that
    # already imported jax): LSHM_PLATFORM pins the backend via jax.config (works any
    # time before first backend use), LSHM_HOST_DEVICE_COUNT fakes N CPU devices for
    # mesh runs without hardware.
    import os

    ndev = os.environ.get("LSHM_HOST_DEVICE_COUNT")
    if ndev:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={ndev}"
            ).strip()
    plat = os.environ.get("LSHM_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    # Persistent XLA compilation cache: TPU compiles of the flagship step run
    # minutes on a loaded relay; caching makes repeat CLI runs skip them entirely.
    # Opt out with LSHM_JAX_CACHE_DIR="".
    cache_dir = os.environ.get(
        "LSHM_JAX_CACHE_DIR", os.path.expanduser("~/.cache/lshm_tpu/jax")
    )
    if cache_dir:
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    ap = argparse.ArgumentParser(prog="lshm_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("synth", help="write a synthetic MS_extract.h5")
    p.add_argument("--out", required=True)
    p.add_argument("--nstations", type=int, default=6)
    p.add_argument("--ntime", type=int, default=192)
    p.add_argument("--nfreq", type=int, default=192)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("train", help="train the cascaded AE + KHM model")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--preset", default="full_khm",
                   choices=["ae2d_adam", "fourier_cascade", "full_khm",
                            "full_khm_bf16", "full_khm_lbfgs"])
    p.add_argument("--log-jsonl", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the first epoch here")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host: jax.distributed coordinator address "
                        "(or env JAX_COORDINATOR_ADDRESS)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    _add_set(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="clustering evaluation report")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", default="eval_out")
    p.add_argument("--preset", default="full_khm")
    p.add_argument("--sap-index", type=int, default=0)
    p.add_argument("--hard-clusters", type=int, default=10)
    p.add_argument("--montages", action="store_true")
    p.add_argument("--recon-panels", action="store_true",
                   help="per-baseline [x|xhat]/[x2|x3]/[xrec|xerr] pseudocolor panels")
    _add_set(p)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("import-torch", help="convert reference .model checkpoints")
    p.add_argument("--net", required=True)
    p.add_argument("--net-t", default=None)
    p.add_argument("--net-f", default=None)
    p.add_argument("--fnet", default=None,
                   help="legacy Fourier-space AE (net/fnet/khm trio, Demo.ipynb)")
    p.add_argument("--khm", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--no-rica", action="store_true")
    p.set_defaults(fn=cmd_import_torch)

    p = sub.add_parser("graph", help="train a GNN over learned latents")
    p.add_argument("kind", choices=["line", "station"])
    p.add_argument("--data-dir", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--preset", default="full_khm")
    p.add_argument("--sap-index", type=int, default=0)
    p.add_argument("--epochs", type=int, default=None,
                   help="line: Adam epochs on the one graph (default 200); station: "
                        "number of randomly rebuilt graphs, each a full-SAP read + "
                        "forward sweep (default 5; reference train_graph_stat.py)")
    p.add_argument("--steps-per-graph", type=int, default=20,
                   help="station: Adam steps per rebuilt graph")
    p.add_argument("--hidden", type=int, default=4)
    p.add_argument("--plot", default=None, metavar="PNG",
                   help="render the graph structure before training "
                        "(reference: src/train_graph.py:163-185)")
    _add_set(p)
    p.set_defaults(fn=cmd_graph)

    p = sub.add_parser("demo", help="render a synthetic fringe spectrogram PNG")
    p.add_argument("--out", default="fringe.png")
    p.add_argument("--ntime", type=int, default=128)
    p.add_argument("--nfreq", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_demo)

    p = sub.add_parser("rica", help="learn a RICA sparse dictionary over patches")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out", default="rica_out")
    p.add_argument("--iters", type=int, default=10,
                   help="minibatches (reference runs 80 epochs x 100 iters)")
    p.add_argument("--batch", type=int, default=8, help="baselines per minibatch "
                   "(reference default_batch=128, src/rica_lofar.py:23)")
    p.add_argument("--patch-size", type=int, default=128)
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--dict-size", type=int, default=256, metavar="M")
    p.add_argument("--l1", type=float, default=0.1, help="lambda1 sparsity weight")
    p.add_argument("--eta", type=float, default=0.1, help="dictionary ascent rate")
    p.add_argument("--solver-iters", type=int, default=10,
                   help="L-BFGS max_iter per sparse-code solve")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_rica)

    p = sub.add_parser("export", help="serialize the trained forward to StableHLO")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", default="lshm_forward.jaxexp")
    p.add_argument("--preset", default="full_khm")
    p.add_argument("--batch", type=int, default=0,
                   help="static batch size; 0 = symbolic (any batch)")
    _add_set(p)
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
