"""Headline benchmark: cascaded AE+KHM ADMM training throughput (patches/sec/chip).

Measures the jitted full-cascade ADMM train step (Adam path) at the reference flagship
dimensions and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "patches/s", "vs_baseline": N / reference, ...}

The unit of work mirrors the PyTorch reference exactly — one ADMM inner iteration =
closure fwd+bwd of all loss terms + optimizer update + dual-update forward
(reference: src/kharmonic_lofar.py:131-202) — so ``vs_baseline`` is the per-chip
speedup over the reference measured by benchmarks/measure_reference.py.

The headline runs the accuracy-gated mixed-precision mode
(``compute_dtype="bfloat16_full"``: bf16 activations/residuals/duals, f32
params/optimizer/loss accumulation — tests/test_bf16.py; measured flagship final
loss after 10 ADMM iters within 3e-4 of f32, 15.2052 vs 15.2049).  A pure-f32
control is measured as a secondary; override the headline dtype with
LSHM_BENCH_DTYPE=float32.

Timing discipline (round-3 rebuild; see VERDICT.md round 2):
  * ``jax.block_until_ready`` acks after *dispatch*, not execution, on the axon TPU
    relay — every prior number timed with it was a dispatch rate (1000x off).  Every
    repetition here forces completion by fetching a host scalar that depends on the
    result (``float(metrics["loss"][-1])``).
  * The per-fetch relay round trip is cancelled with a two-point fit: time N1 and N2
    chained steps each ending in one fetch; the marginal cost (dt2-dt1)/(N2-N1) is the
    true per-step execution time, free of the constant RTT + dispatch overhead.  The
    same two points double as a linearity check (marginal ~ proportional work).
  * MFU is computed from the compiled executable's own XLA cost analysis and the v5e
    197 TFLOP/s bf16 ceiling; any measurement implying MFU > 1.0 is by definition a
    measurement bug and is REFUSED (error JSON, exit 1) rather than printed.
  * The headline JSON is printed and flushed the moment the headline measurement
    lands; optional secondary metrics only run inside the remaining wall budget
    (LSHM_BENCH_BUDGET_S, default 480 s) and the final line repeats the headline with
    enriched detail — a driver timeout mid-secondary still leaves a valid line.
  * A persistent compilation cache (LSHM_JAX_CACHE_DIR, default ``.jax_cache/`` in the
    repo) makes repeat runs skip the multi-minute relay compile.
  * A serialized-export trace cache (``.jax_cache/exported/``, LSHM_BENCH_TRACE_CACHE=0
    to disable) additionally skips Python tracing + lowering (~30-40 s per program on
    this 1-core host) on repeat runs: the step is exported once (jax.export) keyed by a
    source-tree digest + argument avals, and later runs deserialize the identical
    StableHLO module — which then also hits the XLA persistent cache.  A warm repeat
    run on a healthy relay fits ALL secondaries inside the default 480 s driver
    budget (measured 2026-08-20: lbfgs warm compile 8.6 s vs 148 s cold).  During a
    relay-degradation window (even trivial jits blocked for minutes; see
    benchmarks/PERF_NOTES.md round-5 addendum) no budget suffices — the watchdogs
    then bound each phase and the error path surfaces ``last_good_run`` from
    ``benchmarks/last_bench.json`` so the driver still records the most recent
    complete honest measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

# Persistent compile cache BEFORE importing jax-heavy modules (safe pre-backend-init).
_CACHE_DIR = os.environ.get("LSHM_JAX_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

BASELINE_PATH = os.path.join(_REPO, "benchmarks", "reference_baseline.json")
DEFAULT_THREADS_PATH = os.path.join(_REPO, "benchmarks",
                                    "reference_baseline_default_threads.json")
LAST_GOOD_PATH = os.path.join(_REPO, "benchmarks", "last_bench.json")

# Realistic LOFAR minibatch geometry: the reference default is 12 baselines per iter
# (src/kharmonic_lofar.py:25) and a real SAP (~512x384+) yields ~35 overlapping
# 128-patches per baseline -> 420 patches.
BATCH_PATCHES = 420
NBASELINES = 12
NADMM = 10                 # reference inner-loop count (src/kharmonic_lofar.py:28)
N1, N2 = 2, 10             # two-point step counts (per timing repetition)
REPS = 3
PEAK_FLOPS = 197e12        # v5e bf16 MXU ceiling — absolute physical bound for MFU


def _budget() -> float:
    return float(os.environ.get("LSHM_BENCH_BUDGET_S", "480"))


def _flagship_setup(batch: int, nbase: int, optimizer: str = "adam",
                    remat: bool = False, compute_dtype: str = "float32",
                    nadmm: int = NADMM):
    """Shared benchmark scaffolding: flagship config + model + a random baseline-major
    minibatch of ``batch`` patches over ``nbase`` baselines.

    The L-BFGS path lowers its ADMM loop as one lax.scan
    (``admm_unroll_lbfgs=False``, the full_khm_lbfgs preset default this secondary
    certifies): measured perf-neutral for L-BFGS (the line-search while loops
    partition the program either way; benchmarks/lbfgs_decompose.py round 4) and
    the compile cost stops scaling with admm_iters (was 148 s at nadmm=2
    unrolled, BENCH_r04).  The Adam path keeps the unrolled lowering (6.4x)."""
    from lshm_tpu.config import (
        Config, DataConfig, LBFGSConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from lshm_tpu.models import CascadedAE

    cfg = Config(
        data=DataConfig(batch_size=nbase, patch_size=128),
        model=ModelConfig(latent_dim=224, latent_dim_1d=16, num_clusters=10, rica=True,
                          khm_backend="xla", compute_dtype=compute_dtype,
                          packed_conv2d=int(os.environ.get(
                              "LSHM_BENCH_PACKED", ModelConfig.packed_conv2d))),
        optim=OptimConfig(
            optimizer=optimizer, adam_lr=1e-4,
            lbfgs=LBFGSConfig(history_size=7, max_iter=4, line_search=True,
                              batch_mode=True),
        ),
        train=TrainConfig(admm_iters=nadmm, remat=remat, admm_unroll_lbfgs=False),
    )
    model = CascadedAE(cfg=cfg.model)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, 128, 128, 4), jnp.float32)
    uv = jnp.repeat(
        jax.random.normal(jax.random.fold_in(key, 1), (nbase, 2)),
        batch // nbase, axis=0,
    )
    return cfg, model, x, uv, jax.random.fold_in(key, 2)


def _fetch_scalar(metrics) -> float:
    """Completion-forcing sync: a host fetch of a value that depends on the step's
    result.  NEVER replace with block_until_ready (dispatch-ack on this relay)."""
    return float(jax.device_get(metrics["loss"][-1]))


def _cost_flops(compiled) -> float | None:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


_EXPORT_DIR = os.path.join(_CACHE_DIR, "exported")


def _source_digest() -> str:
    """Content hash of everything that determines the traced program: the package
    source tree + this file + the jax/jaxlib versions + the backend platform.  Any
    code change rotates the key, so a stale serialized export can never be timed."""
    import hashlib

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    try:
        import jaxlib

        h.update(getattr(jaxlib, "__version__", "?").encode())
    except Exception:
        pass
    h.update(jax.default_backend().encode())
    h.update(str(jax.devices()[0].device_kind).encode())
    pkg = os.path.join(_REPO, "lshm_tpu")
    files = [os.path.abspath(__file__)]
    for root, _dirs, names in os.walk(pkg):
        files.extend(os.path.join(root, n) for n in names if n.endswith(".py"))
    for path in sorted(files):
        h.update(path.encode())
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


_SOURCE_DIGEST = None  # computed lazily once per process


class _FlatStep:
    """A compiled train step over FLATTENED leaves: ``out = call(*s_leaves,
    *d_leaves)`` where ``out[:-1]`` are the next state leaves (chainable) and
    ``out[-1]`` is the step's final ADMM loss (the completion-forcing fetch
    target).  Flattening sidesteps jax.export's pytree-serialization registry
    (optax/flax node types are not registered) — the treedefs are host-side
    trace-time structure, rebuilt from live objects on every run."""

    def __init__(self, compiled, s_leaves, d_leaves, compile_sec, trace_cache,
                 func_evals_idx=None):
        self.compiled = compiled
        self.s_leaves0 = list(s_leaves)
        self.d_leaves = list(d_leaves)
        self.compile_sec = compile_sec
        self.trace_cache = trace_cache          # "warm" | "cold"
        self.func_evals_idx = func_evals_idx
        self.flops = _cost_flops(compiled)
        self._s = list(s_leaves)

    def run_chain(self, n: int) -> float:
        """n chained steps ending in one completion-forcing host fetch of the loss."""
        out = None
        for _ in range(n):
            out = self.compiled(*self._s, *self.d_leaves)
            self._s = list(out[:-1])
        return float(jax.device_get(out[-1]))

    def func_evals(self) -> int | None:
        if self.func_evals_idx is None:
            return None
        return int(jax.device_get(self._s[self.func_evals_idx]))


def _compile_step_cached(tag: str, step_fn, state, data_args,
                         key_extra: str = "", donate: bool = False) -> _FlatStep:
    """AOT-compile ``step_fn(state, *data_args) -> (state, metrics)`` with a
    two-level cache:

      1. serialized jax.export blob (skips Python tracing + lowering, the ~30-40 s
         host cost per program on this 1-core box), keyed by source digest +
         argument avals + ``key_extra`` (dtype/nadmm/... — program choices that
         do not show in the avals);
      2. XLA's persistent compilation cache (skips the multi-minute relay
         compile) — hit guaranteed on a level-1 hit since the deserialized bytes
         reproduce the identical StableHLO module.

    Disable with LSHM_BENCH_TRACE_CACHE=0 (falls back to cold export each run;
    the compiled artifact and timing semantics are IDENTICAL either way — both
    paths time the same exported flat-call module)."""
    import hashlib

    from jax import export as jax_export

    global _SOURCE_DIGEST
    if _SOURCE_DIGEST is None:
        _SOURCE_DIGEST = _source_digest()

    s_leaves, s_tree = jax.tree.flatten(state)
    d_leaves, d_tree = jax.tree.flatten(tuple(data_args))
    ns = len(s_leaves)

    def step_flat(*leaves):
        st = jax.tree.unflatten(s_tree, leaves[:ns])
        da = jax.tree.unflatten(d_tree, leaves[ns:])
        st2, m = step_fn(st, *da)
        return tuple(jax.tree.leaves(st2)) + (m["loss"][-1],)

    avals = ",".join(                     # python-scalar leaves have no .dtype
        f"{jnp.result_type(l)}{tuple(jnp.shape(l))}"
        for l in (*s_leaves, *d_leaves)
    )
    key = hashlib.sha256(
        f"{_SOURCE_DIGEST}|{tag}|{key_extra}|{avals}".encode()
    ).hexdigest()[:32]
    path = os.path.join(_EXPORT_DIR, f"{tag}-{key}.jaxexport")

    use_cache = os.environ.get("LSHM_BENCH_TRACE_CACHE", "1") != "0"
    t0 = time.perf_counter()
    exp = None
    trace_cache = "cold"
    if use_cache and os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = jax_export.deserialize(bytearray(f.read()))
            trace_cache = "warm"
        except Exception:
            exp = None                      # corrupt/incompatible blob: re-export
    if exp is None:
        exp = jax_export.export(jax.jit(step_flat))(*s_leaves, *d_leaves)
        if use_cache:
            try:
                os.makedirs(_EXPORT_DIR, exist_ok=True)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(exp.serialize())
                os.replace(tmp, path)
            except Exception:
                pass
    compiled = jax.jit(
        exp.call, donate_argnums=tuple(range(ns)) if donate else ()
    ).lower(*s_leaves, *d_leaves).compile()
    compile_sec = time.perf_counter() - t0

    func_evals_idx = None
    paths = jax.tree_util.tree_flatten_with_path(state)[0]
    for i, (kp, _leaf) in enumerate(paths):
        if "func_evals" in jax.tree_util.keystr(kp):
            func_evals_idx = i
            break
    return _FlatStep(compiled, s_leaves, d_leaves, compile_sec, trace_cache,
                     func_evals_idx)


def _measure_rtt() -> float:
    """Fetch round trip on an already-resident tiny array (pure RTT, no compute)."""
    ready = jnp.zeros(())
    float(jax.device_get(ready))
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(ready))
        rtts.append(time.perf_counter() - t0)
    return min(rtts)


def _two_point_marginal(run, n1: int, n2: int, reps: int, min_window: float):
    """Generic two-point fit with noise guards.

    ``run(n)`` = wall seconds for n chained calls ending in one completion-forcing
    fetch.  The marginal (dt2-dt1)/(n2-n1) cancels the constant RTT — but on a noisy
    relay a single inflated dt1 can make it negative, so n2 is widened (x4, capped)
    until the measurement window dt2-dt1 clears ``min_window`` and the marginal is
    positive; if it never does, fall back to the median, then to the raw per-call
    upper bound (strictly positive), flagged ``noise_fallback``.

    Returns (marginal_sec, pairs, n2_used, noise_fallback)."""
    n2_cap = max(16 * n2, n2)
    while True:
        pairs = [(run(n1), run(n2)) for _ in range(reps)]
        margs = sorted((d2 - d1) / (n2 - n1) for d1, d2 in pairs)
        marginal = margs[0]
        window = min(d2 - d1 for d1, d2 in pairs)
        if (marginal > 0 and window >= min_window) or n2 >= n2_cap:
            break
        n2 = min(n2 * 4, n2_cap)
    fallback = False
    if marginal <= 0:
        raw = min(d2 for _, d2 in pairs) / n2
        med = margs[len(margs) // 2]
        marginal = med if med > 0 else raw
        fallback = True
    return marginal, pairs, n2, fallback


def _measure_two_point(step, state, x, uv, w, nadmm: int):
    """Two-point timing of a chained (state, x, uv, w) -> (state, metrics) step.

    Returns (detail dict with per-ADMM-iter marginal time (RTT-free) plus raw
    end-to-end numbers, final chained state)."""
    last_loss = [None]

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, x, uv, w)
        last_loss[0] = _fetch_scalar(m)   # blocks until all n steps really executed
        return time.perf_counter() - t0

    rtt = _measure_rtt()
    marginal, pairs, n2, fallback = _two_point_marginal(
        run, N1, N2, REPS, min_window=max(5 * rtt, 0.02)
    )
    raw_best = min(d2 for _, d2 in pairs) / n2
    detail = {
        "sec_per_admm_iter": marginal / nadmm,
        "sec_per_step_call": marginal,
        "sec_per_step_call_raw": raw_best,        # includes amortized RTT+dispatch
        "fetch_rtt_sec": rtt,
        "two_point": {"n1": N1, "n2": n2, "pairs_sec": pairs,
                      "noise_fallback": fallback},
        "final_loss": last_loss[0],
        "timing_method": "two-point host-scalar-fetch (RTT-cancelled)",
    }
    return detail, state


def _measure_two_point_flat(fstep: _FlatStep, nadmm: int) -> dict:
    """Two-point timing of a _FlatStep (same protocol/semantics as
    _measure_two_point: every run(n) chains n steps and ends in one
    completion-forcing host fetch of the step's final loss)."""
    last_loss = [None]

    def run(n):
        t0 = time.perf_counter()
        last_loss[0] = fstep.run_chain(n)
        return time.perf_counter() - t0

    rtt = _measure_rtt()
    marginal, pairs, n2, fallback = _two_point_marginal(
        run, N1, N2, REPS, min_window=max(5 * rtt, 0.02)
    )
    raw_best = min(d2 for _, d2 in pairs) / n2
    return {
        "sec_per_admm_iter": marginal / nadmm,
        "sec_per_step_call": marginal,
        "sec_per_step_call_raw": raw_best,
        "fetch_rtt_sec": rtt,
        "two_point": {"n1": N1, "n2": n2, "pairs_sec": pairs,
                      "noise_fallback": fallback},
        "final_loss": last_loss[0],
        "timing_method": "two-point host-scalar-fetch (RTT-cancelled)",
    }


def measure_ours(compute_dtype: str | None = None, batch: int = BATCH_PATCHES,
                 nbase: int = NBASELINES) -> dict:
    """Headline measurement: the flagship ADMM step, honest execution time."""
    from lshm_tpu.train import LossWeights, init_train_state, make_train_step

    dtype = compute_dtype or os.environ.get("LSHM_BENCH_DTYPE", "bfloat16_full")
    donate = bool(int(os.environ.get("LSHM_BENCH_DONATE", "0")))
    cfg, model, x, uv, key = _flagship_setup(batch, nbase, compute_dtype=dtype)
    state, tx = init_train_state(model, cfg, key, x, uv)
    step_fn = make_train_step(model, tx, cfg, num_groups=nbase, donate=False,
                              jit=False)
    w = LossWeights()
    fstep = _compile_step_cached(
        "adam_step", step_fn, state, (x, uv, w),
        key_extra=f"{dtype}|nadmm={NADMM}|packed={cfg.model.packed_conv2d}"
                  f"|donate={donate}",
        donate=donate,
    )
    flops = fstep.flops

    fstep.run_chain(1)                            # warmup execution (fetch-forced)

    r = _measure_two_point_flat(fstep, NADMM)
    dt = r["sec_per_admm_iter"]
    out = {
        "patches_per_sec": batch / dt,
        "batch_patches": batch,
        "nadmm": NADMM,
        "compute_dtype": dtype,
        "packed_conv2d": cfg.model.packed_conv2d,
        "donate": donate,
        "compile_sec": fstep.compile_sec,
        "trace_cache": fstep.trace_cache,
        "flops_per_step_call": flops,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        **r,
    }
    if flops:
        out["mfu"] = flops / r["sec_per_step_call"] / PEAK_FLOPS
        out["tflops_per_sec"] = flops / r["sec_per_step_call"] / 1e12
    return out


def measure_ours_eval() -> dict:
    """Inference throughput: batched cascade forward + per-baseline cluster distances
    (the evaluate_clustering hot path), honest two-point timing."""
    from lshm_tpu.config import ModelConfig
    from lshm_tpu.eval.clustering import _batched_features
    from lshm_tpu.models import CascadedAE

    cfg = ModelConfig(latent_dim=224, latent_dim_1d=16, num_clusters=10, rica=True)
    model = CascadedAE(cfg=cfg)
    key = jax.random.PRNGKey(0)
    n = 512
    x = jax.random.normal(key, (n, 128, 128, 4), jnp.float32)
    uv = jnp.repeat(jax.random.normal(jax.random.fold_in(key, 1), (n // 4, 2)), 4, axis=0)
    params = model.init(jax.random.fold_in(key, 2), x[:1], uv[:1])

    def fwd(x, uv):
        return _batched_features(model, params, x, uv, 4, 4)

    d, _ = fwd(x, uv)
    float(jax.device_get(d[0, 0]))                # warmup + completion

    def run(k):
        t0 = time.perf_counter()
        d = None
        for _ in range(k):
            d, _ = fwd(x, uv)
        float(jax.device_get(d[0, 0]))
        return time.perf_counter() - t0

    rtt = _measure_rtt()
    marginal, _, _, fallback = _two_point_marginal(
        run, 2, 8, 2, min_window=max(5 * rtt, 0.02)
    )
    out = {"eval_patches_per_sec": n / marginal, "eval_sec_per_batch": marginal,
           "eval_batch": n}
    if fallback:
        out["eval_noise_fallback"] = True
    return out


def measure_ours_lbfgs() -> dict:
    """Secondary: the stochastic L-BFGS ADMM step (on-device line searches), honest
    two-point timing; same unit of work per ADMM iteration as the reference's
    LBFGSNew mode.

    BENCH_r03's lbfgs secondary timed out COMPILING the nadmm=10 *unrolled* chain,
    and BENCH_r04's nadmm=2 fallback still burned 148 s recompiling it.  Round 5
    lowers the L-BFGS ADMM loop as one lax.scan (see _flagship_setup), so this
    secondary now runs the full reference nadmm=10 unit of work (override:
    LSHM_BENCH_LBFGS_NADMM) with an admm_iters-independent compile; compilation
    additionally goes through the persistent cache and is reported separately,
    outside the timed window."""
    from lshm_tpu.train import LossWeights, init_lbfgs_train_state, make_lbfgs_train_step

    nadmm = int(os.environ.get("LSHM_BENCH_LBFGS_NADMM", str(NADMM)))
    # mixed-precision closure (bf16 conv/dense activations, f32 residual/loss path —
    # the full_khm_lbfgs preset default): the f32 Armijo comparisons keep the search
    # trajectory near-identical to the f32 closure (same func_evals + loss to 7e-6
    # rel at flagship dims, PERF_NOTES round 4), unlike bf16_full whose loss noise
    # blew up func_evals 6.8x
    dtype = os.environ.get("LSHM_BENCH_LBFGS_DTYPE", "bfloat16")
    cfg, model, x, uv, key = _flagship_setup(
        BATCH_PATCHES, NBASELINES, optimizer="lbfgs", nadmm=nadmm,
        compute_dtype=dtype,
    )
    state = init_lbfgs_train_state(model, cfg, key, x, uv)
    step = make_lbfgs_train_step(model, cfg, num_groups=NBASELINES, donate=False,
                                 jit=False)
    w = LossWeights()
    fstep = _compile_step_cached(
        "lbfgs_step", step, state, (x, uv, w),
        key_extra=f"{dtype}|nadmm={nadmm}",
    )
    fstep.run_chain(1)                            # warmup execution (fetch-forced)
    r = _measure_two_point_flat(fstep, nadmm)
    # func_evals from the state AFTER the timed chain, so the diagnostic reflects
    # the measured work (cumulative closure evaluations across all timed steps)
    return {
        "lbfgs_patches_per_sec": BATCH_PATCHES / r["sec_per_admm_iter"],
        "lbfgs_sec_per_admm_iter": r["sec_per_admm_iter"],
        "lbfgs_nadmm": nadmm,
        "lbfgs_compute_dtype": dtype,
        "lbfgs_compile_sec": fstep.compile_sec,
        "lbfgs_trace_cache": fstep.trace_cache,
        "lbfgs_func_evals": fstep.func_evals(),
    }


def measure_ours_peak() -> dict:
    """Secondary: the same flagship step at the throughput-optimal batch (840 = 24
    baselines x 35 patches; measured sweep 420 -> 41.0k, 840 -> 45.5k, 1680 -> 40.6k
    patches/s, benchmarks/scaling_bf16full.json) — the per-chip peak for users who can
    feed wider minibatches than the reference's default geometry."""
    d = measure_ours(batch=840, nbase=24)
    out = {
        "peak_patches_per_sec": d["patches_per_sec"],
        "peak_batch_patches": d["batch_patches"],
        "peak_sec_per_admm_iter": d["sec_per_admm_iter"],
    }
    if d.get("mfu") is not None:
        out["peak_mfu"] = d["mfu"]
    return out


def measure_ours_f32() -> dict:
    """Secondary: the same flagship step in pure float32 — the bit-conservative
    control for the mixed-precision headline (the headline's bfloat16_full mode is
    accuracy-gated by tests/test_bf16.py: f32 params/optimizer/loss accumulation,
    bf16 activations/residuals/duals; measured flagship final loss within 3e-4 of
    f32 after 10 ADMM iters)."""
    d = measure_ours("float32")
    return {
        "f32_patches_per_sec": d["patches_per_sec"],
        "f32_sec_per_admm_iter": d["sec_per_admm_iter"],
        "f32_mfu": d.get("mfu"),
    }


def _emit(headline_pps: float, detail: dict) -> str:
    vs = None
    vs_1core = None
    if os.path.exists(DEFAULT_THREADS_PATH):
        with open(DEFAULT_THREADS_PATH) as f:
            ref = json.load(f)
        if ref.get("patches_per_sec"):
            vs = headline_pps / ref["patches_per_sec"]
            detail["reference_default_threads_pps"] = ref["patches_per_sec"]
            detail["reference_torch_threads"] = ref.get("torch_threads")
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            ref = json.load(f)
        if ref.get("patches_per_sec"):
            vs_1core = headline_pps / ref["patches_per_sec"]
            detail["reference_1core_pps"] = ref["patches_per_sec"]
    if vs is None:                       # fall back to the 1-core floor
        vs = vs_1core
    if vs_1core is not None:
        detail["vs_baseline_1core"] = round(vs_1core, 2)
    line = json.dumps({
        "metric": "ae_khm_train_patches_per_sec_per_chip",
        "value": round(headline_pps, 2),
        "unit": "patches/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "mfu": detail.get("mfu"),
        "detail": detail,
    })
    print(line, flush=True)
    try:                                 # record for relay-outage diagnostics only
        with open(LAST_GOOD_PATH, "w") as f:
            f.write(json.dumps({"recorded_at": time.time(), "line": json.loads(line)})
                    + "\n")
    except OSError:
        pass
    return line


def _mfu_refusal(detail: dict) -> str | None:
    """Error JSON line if the measurement implies impossible MFU, else None.

    A computed MFU > 1.0 (or <= 0) exceeds/violates the chip's physical ceiling and
    is by definition a measurement bug (dispatch-ack timing; VERDICT.md round 2)."""
    mfu = detail.get("mfu")
    if mfu is not None and (mfu > 1.0 or mfu <= 0.0):
        return json.dumps({
            "metric": "ae_khm_train_patches_per_sec_per_chip",
            "value": None, "unit": "patches/s", "vs_baseline": None,
            "error": f"REFUSED: implied MFU {mfu:.3g} outside (0, 1] — measurement "
                     f"bug (dispatch-ack timing?); see VERDICT.md round 2",
            "detail": detail,
        })
    return None


def _run_bounded(fn, seconds: float, what: str):
    """Run ``fn()`` with a hard wall bound that survives a hang inside a blocking
    C call.

    A hung relay (observed: trivial jits block >10 min in transient relay-down
    windows) would otherwise leave the driver's `timeout N python bench.py` with
    rc=124 and an EMPTY tail — indistinguishable from a broken bench.  SIGALRM is
    not enough: CPython only runs the Python-level handler between bytecodes, so an
    alarm that fires while the worker is inside one long PJRT/relay call is
    deferred until that call returns.  Instead the measurement runs in a daemon
    thread and the main thread waits with a timeout; on expiry it raises
    TimeoutError while still able to print diagnostics (callers then exit via
    os._exit so the stuck thread cannot block interpreter shutdown)."""
    import threading

    seconds = max(int(seconds), 1)
    result: list = [None]
    error: list = [None]

    def work():
        try:
            result[0] = fn()
        except BaseException as e:  # surfaced in the caller's thread
            error[0] = e

    t = threading.Thread(target=work, daemon=True, name=f"bench-{what[:24]}")
    t.start()
    t.join(seconds)
    if t.is_alive():
        raise TimeoutError(
            f"{what} exceeded {seconds}s — relay hung or compiling beyond budget "
            f"(axon transient-down windows block even trivial jits)"
        )
    if error[0] is not None:
        raise error[0]
    return result[0]


def main():
    t_start = time.perf_counter()
    budget = _budget()
    hung = False
    try:
        # leave >=30 s of the driver budget to print diagnostics + any cached info
        # (floor of 60 s so a tiny LSHM_BENCH_BUDGET_S can't starve the headline)
        detail = _run_bounded(measure_ours, max(budget - 30, 60),
                              "headline measurement (compile + timed steps)")
    except Exception as e:
        hung = isinstance(e, TimeoutError)
        err = {"metric": "ae_khm_train_patches_per_sec_per_chip",
               "value": None, "unit": "patches/s", "vs_baseline": None,
               "error": repr(e)[:400],
               "note": "relay outages block all TPU compiles for hours at a time; "
                       "the dated honest measurements live in README.md#performance "
                       "and benchmarks/PERF_NOTES.md"}
        # surface the last successful measurement for context — value stays None
        # (an old number is NOT this run's result), but a transient relay outage
        # should not erase all evidence that the bench works
        try:
            with open(LAST_GOOD_PATH) as f:
                err["last_good_run"] = json.load(f)
        except (OSError, ValueError):
            pass
        print(json.dumps(err), flush=True)
        if hung:        # a stuck relay thread would block interpreter shutdown
            sys.stdout.flush()
            os._exit(1)
        raise
    refusal = _mfu_refusal(detail)
    if refusal is not None:
        print(refusal, flush=True)
        sys.exit(1)
    headline_pps = detail["patches_per_sec"]
    _emit(headline_pps, detail)          # headline lands immediately (flushed)

    # Secondaries only inside the remaining budget; each prints a refreshed headline
    # line so the LAST stdout line is always the fullest valid result.
    # Order = priority under a shrinking wall budget AND blast-radius control: a
    # TimeoutError leaves the worker thread stuck in a C call, so everything after
    # the stuck secondary is lost (os._exit below).  lbfgs is the certified
    # reference training mode (README.md:24-30) and runs right after the cheap
    # cached-eval; peak (a fresh batch-840 compile, the most likely to blow its
    # budget on a loaded relay) goes LAST so a hang there costs nothing.
    secondaries = [("eval", measure_ours_eval)]
    if not os.environ.get("LSHM_BENCH_SKIP_LBFGS"):
        secondaries.append(("lbfgs", measure_ours_lbfgs))
    # f32 control is redundant when the headline itself was overridden to float32
    if (not os.environ.get("LSHM_BENCH_SKIP_F32")
            and detail.get("compute_dtype") != "float32"):
        secondaries.append(("f32", measure_ours_f32))
    if not os.environ.get("LSHM_BENCH_SKIP_PEAK"):
        secondaries.append(("peak", measure_ours_peak))
    compile_cost = detail.get("compile_sec", 120.0)
    for name, fn in secondaries:
        elapsed = time.perf_counter() - t_start
        if elapsed + compile_cost * 1.3 + 30 > budget:
            detail[f"{name}_skipped"] = "wall budget"
            _emit(headline_pps, detail)   # surface the skip even when it is last
            continue
        try:
            # bound each secondary by the remaining wall budget: a relay hang here
            # must not turn an already-valid headline into a driver rc=124
            detail.update(_run_bounded(fn, budget - elapsed - 15,
                                       f"secondary '{name}'"))
        except Exception as e:
            detail[f"{name}_error"] = repr(e)[:200]
            if isinstance(e, TimeoutError):
                # the worker thread is stuck in a C call; emit the final line and
                # leave via os._exit so shutdown can't block on it
                _emit(headline_pps, detail)
                sys.stdout.flush()
                os._exit(0)               # headline is valid: exit clean
        _emit(headline_pps, detail)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["headline", "eval", "peak", "lbfgs", "f32"],
                    default=None)
    ap.add_argument("--dtype", default=None, help="compute dtype for --only headline")
    args = ap.parse_args()
    if args.only == "headline":
        print(json.dumps(measure_ours(args.dtype)), flush=True)
    elif args.only == "eval":
        print(json.dumps(measure_ours_eval()), flush=True)
    elif args.only == "peak":
        print(json.dumps(measure_ours_peak()), flush=True)
    elif args.only == "lbfgs":
        print(json.dumps(measure_ours_lbfgs()), flush=True)
    elif args.only == "f32":
        print(json.dumps(measure_ours_f32()), flush=True)
    else:
        main()
