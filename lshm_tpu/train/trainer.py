"""Top-level training orchestration.

The equivalent of running the reference's ``kharmonic_lofar.py`` script
(reference: src/kharmonic_lofar.py:115-222) — but with the whole experiment as config:
epochs x iters x ADMM schedule, the published alpha/beta/gamma ramp with the
Adam -> L-BFGS switch, alternating model-group updates, prefetching input pipeline,
metric logging, and unified orbax checkpointing with exact resume.
"""

from __future__ import annotations

import os
import sys
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from lshm_tpu.config import Config
from lshm_tpu.data import MinibatchSampler, scan_files
from lshm_tpu.models import CascadedAE
from lshm_tpu.train.objective import LossWeights
from lshm_tpu.train.schedule import active_group, ramp_stage_for_epoch
from lshm_tpu.train.step import (
    init_lbfgs_train_state,
    init_train_state,
    make_lbfgs_train_step,
    make_train_step,
)
from lshm_tpu.utils.metrics import MetricLogger


class Trainer:
    """Stateful training driver.  Handles Adam/L-BFGS switching (params carry over;
    optimizer moments reset on switch, like the reference's re-run-with-edits recipe)."""

    def __init__(self, cfg: Config, logger: MetricLogger | None = None,
                 profile_dir: str | None = None):
        self.cfg = cfg
        self.model = CascadedAE(cfg=cfg.model)
        self.logger = logger or MetricLogger(echo=True)
        self.profile_dir = profile_dir   # jax.profiler trace output (None = off)
        self._step_cache: dict = {}
        self._params = None          # canonical params pytree
        self._opt_kind = None        # ("adam"|"lbfgs", group)
        self._state = None
        self._mesh = "unresolved"    # lazy: resolved from cfg.train.mesh_shape on use

    # ------------------------------------------------------------------- device mesh
    @property
    def mesh(self):
        """Device mesh from ``cfg.train.mesh_shape`` (None = plain single-device jit).

        ``(1,)``/``()`` = unsharded; ``-1`` absorbs all devices; any product > 1
        builds the GSPMD data-parallel mesh and every train step runs through
        ``train_step_sharded`` (state replicated, patch batch sharded).  Multi-process
        runs ALWAYS get a mesh spanning every global device: collective-free per-host
        replicas silently diverge, so single-device stepping is not allowed there."""
        if self._mesh == "unresolved":
            import math

            from lshm_tpu.train.parallel import make_mesh

            shape = tuple(self.cfg.train.mesh_shape) or (1,)
            nproc = jax.process_count()
            if nproc > 1:
                total = len(jax.devices())
                if -1 not in shape and math.prod(shape) != total:
                    if math.prod(shape) == 1:
                        # default config: auto-span all devices on the first (data)
                        # axis, keeping one dim per configured axis name so
                        # multi-axis configs like mesh_axes=("data","model") still
                        # build (Mesh requires len(shape) == len(axis_names))
                        shape = (-1,) + (1,) * (len(self.cfg.train.mesh_axes) - 1)
                    else:
                        raise ValueError(
                            f"train.mesh_shape={shape} does not cover the "
                            f"{total} global devices of this {nproc}-process run"
                        )
                self._mesh = make_mesh(shape, self.cfg.train.mesh_axes)
            elif -1 in shape or math.prod(shape) > 1:
                self._mesh = make_mesh(shape, self.cfg.train.mesh_axes)
            else:
                self._mesh = None
        return self._mesh

    def _placer(self):
        """How host minibatch arrays reach the devices: plain asarray when unsharded;
        batch-dim sharded device_put on a mesh; global-array assembly from per-host
        shards in multi-process runs (each host's sampler contributes its rows)."""
        if self.mesh is None:
            return jnp.asarray
        from lshm_tpu.train.parallel import batch_sharding

        sh = batch_sharding(self.mesh, self.cfg.train.mesh_axes[0])
        nproc = jax.process_count()
        if nproc == 1:
            return lambda a: jax.device_put(a, sh)

        def place(a):
            a = np.asarray(a)
            return jax.make_array_from_process_local_data(
                sh, a, (a.shape[0] * nproc, *a.shape[1:])
            )

        return place

    # ---------------------------------------------------------------- state management
    def _ensure_state(self, kind: str, group: str, x, uv):
        if self._params is None:
            if kind == "adam":
                state, tx = init_train_state(
                    self.model, self.cfg, jax.random.PRNGKey(self.cfg.train.seed), x, uv,
                    group=group,
                )
                self._state, self._tx = state, tx
                self._params = state.params
            else:
                self._state = init_lbfgs_train_state(
                    self.model, self.cfg, jax.random.PRNGKey(self.cfg.train.seed), x, uv
                )
                self._params = self._state.params
            self._opt_kind = (kind, group)
            self._replicate_if_mesh()
            return

        if (kind, group) != self._opt_kind:
            self._sync_params()  # capture latest params before rebuilding optimizer state
            # carry params across the optimizer/group switch, reset optimizer state
            from lshm_tpu.optim import lbfgs_init
            from lshm_tpu.train.step import LBFGSTrainState, TrainState, make_optimizer

            step_count = (
                self._state.step if self._state is not None else jnp.zeros((), jnp.int32)
            )
            if kind == "adam":
                tx = make_optimizer(self.cfg, self._params, group)
                self._tx = tx
                self._state = TrainState(
                    params=self._params, opt_state=tx.init(self._params), step=step_count
                )
            else:
                self._state = LBFGSTrainState(
                    params=self._params,
                    opt_state=lbfgs_init(self._params, self.cfg.optim.lbfgs),
                    step=step_count,
                )
            self._replicate_if_mesh()
            self._opt_kind = (kind, group)

    def _replicate_if_mesh(self):
        if self.mesh is not None:
            from lshm_tpu.train.parallel import replicate_state

            self._state = replicate_state(self.mesh, self._state)
            self._params = self._state.params

    def _get_step(self, kind: str, group: str, num_groups: int) -> Callable:
        key = (kind, group, num_groups)
        if key not in self._step_cache:
            sharded = self.mesh is not None
            if kind == "adam":
                step = make_train_step(
                    self.model, self._tx, self.cfg, num_groups, donate=False,
                    jit=not sharded,
                )
            else:
                step = make_lbfgs_train_step(
                    self.model, self.cfg, num_groups, group=group, donate=False,
                    jit=not sharded,
                )
            if sharded:
                from lshm_tpu.train.parallel import train_step_sharded

                step = train_step_sharded(
                    step, self.mesh, self.cfg.train.mesh_axes[0], donate=False
                )
            self._step_cache[key] = step
        return self._step_cache[key]

    def _sync_params(self):
        if self._state is None:
            return  # nothing newer than self._params (e.g. right after load())
        if self._opt_kind is not None:
            self._params = self._state.params

    @property
    def params(self):
        self._sync_params()
        return self._params

    # ------------------------------------------------------------------------ training
    def run(self, sampler: MinibatchSampler | None = None) -> dict:
        cfg = self.cfg
        if sampler is None:
            files, saps = scan_files(
                cfg.data.data_dir, cfg.data.file_pattern, cfg.data.recursive_search
            )
            if not files:
                raise FileNotFoundError(f"no valid H5 data under {cfg.data.data_dir!r}")
            sampler = MinibatchSampler(files, saps, cfg.data, seed=cfg.train.seed)

        placer = self._placer()
        nproc = jax.process_count()
        start_epoch = getattr(self, "_resume_epoch", 0)
        start_iter = getattr(self, "_resume_iter", 0)
        self._resume_epoch = 0   # consume: a second run() starts fresh
        self._resume_iter = 0
        for epoch in range(start_epoch, cfg.train.num_epochs):
            if hasattr(sampler, "reseed"):
                sampler.reseed(epoch)   # per-epoch stream: resume == uninterrupted run
            stage = ramp_stage_for_epoch(cfg.train.ramp, epoch)
            if stage is not None:
                w = LossWeights(
                    alpha=stage.alpha, beta=stage.beta, gamma=stage.gamma,
                    rho=cfg.loss.rho, rica_lambda=cfg.loss.rica_lambda,
                )
                kind = stage.optimizer
            else:
                w = LossWeights(
                    alpha=cfg.loss.alpha, beta=cfg.loss.beta, gamma=cfg.loss.gamma,
                    rho=cfg.loss.rho, rica_lambda=cfg.loss.rica_lambda,
                )
                kind = cfg.optim.optimizer
            group = active_group(cfg.optim.group_schedule, epoch)

            profiling = self.profile_dir is not None and epoch == start_epoch
            if profiling:
                jax.profiler.start_trace(self.profile_dir)
            first_iter = start_iter if epoch == start_epoch else 0
            if first_iter and hasattr(sampler, "skip"):
                sampler.skip(first_iter)   # replay rng draws, no I/O: mid-epoch resume
            # background host->device prefetch so the step never waits on h5py
            if cfg.data.prefetch > 0:
                from lshm_tpu.data.sampler import (
                    DeviceDecodePrefetcher,
                    PrefetchIterator,
                )

                use_dd = cfg.data.device_decode
                raw_ok = (self.mesh is None
                          and getattr(sampler, "supports_device_decode", False))
                if use_dd and not raw_ok:
                    raise ValueError(
                        "data.device_decode=True needs an unsharded mesh and the "
                        "default augment transform (custom augment_fns and sharded "
                        "batches use the host-decode path)"
                    )
                if use_dd is None:   # auto: on where the link is the bottleneck
                    use_dd = raw_ok and jax.default_backend() != "cpu"
                if use_dd:
                    source = DeviceDecodePrefetcher(sampler, cfg.data.prefetch,
                                                    device_put=placer)
                else:
                    source = PrefetchIterator(sampler, cfg.data.prefetch,
                                              device_put=placer)
            else:
                if cfg.data.device_decode:
                    raise ValueError(
                        "data.device_decode=True requires data.prefetch > 0 "
                        "(the raw->device decode runs in the prefetcher)"
                    )
                source = None
            pending = None   # (state_before, metrics, it) awaiting the finite check
            def _settle(pending):
                """One-step-delayed non-finite guard: by the time the next minibatch is
                prepared on host, the previous step has usually finished on device, so
                this sync is near-free (checking the current step would serialize
                dispatch)."""
                state_before, metrics, pit = pending
                if not np.isfinite(float(np.asarray(metrics["loss"])[-1])):
                    self._state = state_before   # drop the poisoned step
                    print(f"warning: non-finite loss at epoch {epoch} iter {pit}; "
                          "step reverted")
                    return
                if (pit % max(cfg.train.log_every, 1)) == 0:
                    self.logger.log_step(epoch, pit, metrics,
                                         patches=self._last_batch_shape[0])

            for it in range(first_iter, cfg.train.iters_per_epoch):
                mb = next(source) if source is not None else sampler.sample()
                if source is not None:     # prefetcher already placed the arrays
                    x, uv = mb.x, mb.uv
                else:
                    x, uv = placer(mb.x), placer(mb.uv)
                self._last_batch_shape = tuple(x.shape)
                if self._params is None or (kind, group) != self._opt_kind:
                    # init from a host-side shape template: flax init depends only
                    # on shapes + rng, so params are identical on every process
                    self._ensure_state(
                        kind, group,
                        jnp.zeros((1, *x.shape[1:]), x.dtype),
                        jnp.zeros((1, 2), x.dtype),
                    )
                new_step = (kind, group, mb.num_baselines * nproc) not in self._step_cache
                step = self._get_step(kind, group, mb.num_baselines * nproc)
                if new_step:
                    # first use of this step shape triggers the XLA compile — on a
                    # loaded TPU relay this can take minutes; say so instead of
                    # appearing hung (repeat runs hit the persistent compile cache)
                    print(f"compiling {kind} train step (first run may take minutes; "
                          "cached for later runs)...", file=sys.stderr, flush=True)
                if pending is not None and cfg.train.skip_nonfinite:
                    _settle(pending)
                prev_state = self._state if cfg.train.skip_nonfinite else None
                with jax.profiler.StepTraceAnnotation("train_step", step_num=it):
                    self._state, metrics = step(self._state, x, uv, w)
                if cfg.train.skip_nonfinite:
                    pending = (prev_state, metrics, it)
                elif (it % max(cfg.train.log_every, 1)) == 0:
                    self.logger.log_step(epoch, it, metrics, patches=x.shape[0])
                if (cfg.train.save_every_iters and cfg.train.checkpoint_dir
                        and (it + 1) % cfg.train.save_every_iters == 0
                        and (it + 1) < cfg.train.iters_per_epoch):
                    if pending is not None and cfg.train.skip_nonfinite:
                        _settle(pending)   # never checkpoint an unvalidated step
                        pending = None
                    self.save(cfg.train.checkpoint_dir,
                              step=epoch * cfg.train.iters_per_epoch + it + 1,
                              epoch=epoch, iter_in_epoch=it + 1)
            if pending is not None and cfg.train.skip_nonfinite:
                _settle(pending)
            if source is not None:
                source.close()
            if profiling:
                jax.block_until_ready(jax.tree.leaves(self._state)[0])
                jax.profiler.stop_trace()

            if cfg.train.save_every and (epoch + 1) % cfg.train.save_every == 0:
                self.save(cfg.train.checkpoint_dir,
                          step=(epoch + 1) * cfg.train.iters_per_epoch,
                          epoch=epoch + 1)

        if cfg.train.checkpoint_dir:
            self.save(cfg.train.checkpoint_dir,
                      step=cfg.train.num_epochs * cfg.train.iters_per_epoch,
                      epoch=cfg.train.num_epochs)
        return self.logger.summary()

    # -------------------------------------------------------------------- checkpointing
    def save(self, ckpt_dir: str, step: int, epoch: int | None = None,
             iter_in_epoch: int = 0) -> None:
        """Persist params AND optimizer state (exact resume, unlike the reference's
        params-only torch.save files; reference: src/kharmonic_lofar.py:210-222).
        ``iter_in_epoch`` > 0 marks a mid-epoch checkpoint: resume replays the sampler
        stream to that iteration."""
        from lshm_tpu.utils.checkpoint import save_checkpoint

        self._sync_params()
        if self._params is None and self._state is None:
            print("warning: nothing to checkpoint (no training has run); skipping save")
            return
        state, params = self._state, self._params
        if jax.process_count() > 1:
            # replicated global arrays -> host numpy on EVERY process, then all
            # processes enter save_checkpoint together: orbax's CheckpointManager
            # runs cross-process barriers at save boundaries, so a single-writer
            # early-return would deadlock the barrier; its primary-host logic
            # already makes process 0 the actual writer
            state = jax.device_get(state)
            params = jax.device_get(params)
        extras = {"config": self.cfg.to_dict(), "epoch": epoch,
                  "iter": int(iter_in_epoch)}
        if state is not None:
            ps = self.cfg.data.patch_size
            default_shape = [1, ps, ps, self.cfg.model.num_channels]
            extras["opt_kind"] = list(self._opt_kind)
            extras["batch_shape"] = list(
                getattr(self, "_last_batch_shape", None) or default_shape
            )
            save_checkpoint(ckpt_dir, {"full_state": state}, step, extras=extras)
        else:
            save_checkpoint(ckpt_dir, {"params": params}, step, extras=extras)

    def load(self, ckpt_dir: str, step: int | None = None) -> None:
        """Restore a checkpoint: exact resume (params + optimizer state + epoch) when the
        checkpoint carries full state, params-only otherwise (e.g. torch imports)."""
        import json
        import os

        from lshm_tpu.utils.checkpoint import latest_step, restore_checkpoint

        step = step if step is not None else latest_step(ckpt_dir)
        extras = None
        sidecar = os.path.join(ckpt_dir, f"extras_{step}.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                extras = json.load(f)

        if extras and extras.get("opt_kind") and extras.get("batch_shape"):
            kind, group = extras["opt_kind"]
            shape = tuple(int(s) for s in extras["batch_shape"])
            x = jnp.zeros(shape, jnp.float32)
            uv = jnp.zeros((shape[0], 2), jnp.float32)
            self._params = None
            self._state = None
            self._opt_kind = None
            self._ensure_state(kind, group, x, uv)          # template structure
            restored, _ = restore_checkpoint(ckpt_dir, {"full_state": self._state}, step)
            self._state = restored["full_state"]
            self._replicate_if_mesh()
            self._sync_params()
        else:
            if self._params is None:
                ps = self.cfg.data.patch_size
                x = jnp.zeros((1, ps, ps, self.cfg.model.num_channels))
                uv = jnp.zeros((1, 2))
                self._params = self.model.init(jax.random.PRNGKey(0), x, uv)
            restored, _ = restore_checkpoint(ckpt_dir, {"params": self._params}, step)
            self._params = restored["params"]
            self._opt_kind = None   # force optimizer state rebuild around loaded params
            self._state = None
        if extras and extras.get("epoch") is not None:
            self._resume_epoch = int(extras["epoch"])
            # always overwrite (a later load of an epoch-boundary checkpoint must
            # clear any stale mid-epoch position from a previous load)
            self._resume_iter = int(extras.get("iter") or 0)
        else:
            # a load with no recorded position (params-only, e.g. a torch import)
            # must ALSO clear any stale resume position from an earlier load —
            # otherwise run() would silently skip data from epoch 0
            self._resume_epoch = 0
            self._resume_iter = 0


def train_from_config(cfg: Config) -> Trainer:
    t = Trainer(cfg)
    t.run()
    return t
