"""Guards on the honest-timing harness (bench.py / benchmarks/decompose.py).

Round-3 lessons encoded as tests:
- the chained timer must NOT let XLA dead-code-eliminate the workload (returning only
  the carry scalar once shrank a 137 GFLOP matmul to 16 MFLOP);
- the two-point train-step timing must chain state so repeated calls serialize;
- bench refuses measurements implying MFU > 1.0.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))


def test_chained_timer_keeps_full_workload():
    import decompose

    n = 256
    a = jnp.ones((n, n), jnp.float32)
    r = decompose.time_fn(lambda A: A @ A, (a,), n1=1, n2=2, reps=1)
    # full matmul is ~2*n^3 flops; a DCE'd one-element version would be ~2*n
    assert r["flops"] is not None and r["flops"] > 1.5 * n * n * n


def test_chained_timer_perturbation_negligible():
    import decompose

    x = jnp.full((8, 8), 2.0, jnp.float32)
    carry = jnp.asarray(123.0, jnp.float32)
    y = decompose._perturb_first_float_leaf({"w": x, "i": jnp.arange(3)}, carry)
    np.testing.assert_allclose(np.asarray(y["w"]), 2.0, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(y["i"]), np.arange(3))


def test_bench_mfu_refusal_logic():
    """bench.main must refuse (error JSON) rather than print an impossible number —
    exercises the actual refusal function used by main()."""
    import json

    import bench

    refusal = bench._mfu_refusal({"patches_per_sec": 1e9, "mfu": 40.0})
    assert refusal is not None
    parsed = json.loads(refusal)
    assert parsed["value"] is None and "REFUSED" in parsed["error"]
    assert bench._mfu_refusal({"mfu": -0.5}) is not None      # negative = also a bug
    assert bench._mfu_refusal({"mfu": 0.02}) is None          # sane MFU passes
    assert bench._mfu_refusal({}) is None                     # no cost analysis: pass


def test_two_point_marginal_noise_guard():
    """_two_point_marginal never returns a non-positive marginal, even when fed a
    pathological run() whose dt1 > dt2 (the negative-marginal failure mode)."""
    import bench

    seq = iter([10.0, 0.5] * 40)   # dt1 inflated, dt2 small -> raw marginal < 0

    def run(n):
        return next(seq)

    marginal, _, _, fallback = bench._two_point_marginal(
        run, 2, 10, 2, min_window=0.02
    )
    assert marginal > 0
    assert fallback


def test_two_point_marginal_clean_path():
    """With a well-behaved linear run(), the marginal recovers the per-call cost and
    no fallback is flagged."""
    import bench

    per_call = 0.01
    marginal, _, n2, fallback = bench._two_point_marginal(
        lambda n: 0.05 + per_call * n, 2, 10, 2, min_window=0.02
    )
    assert abs(marginal - per_call) < 1e-9
    assert not fallback and n2 == 10


def test_two_point_on_cpu_scales_with_work():
    """Marginal two-point time grows with per-call work (sanity on CPU)."""
    import decompose

    a_small = jnp.ones((64, 64), jnp.float32)
    a_big = jnp.ones((512, 512), jnp.float32)
    r_small = decompose.time_fn(lambda A: A @ A, (a_small,), n1=1, n2=4, reps=2)
    r_big = decompose.time_fn(lambda A: A @ A, (a_big,), n1=1, n2=4, reps=2)
    assert r_big["flops"] > r_small["flops"]
    assert r_big["sec_per_call"] > 0 and r_small["sec_per_call"] > 0


def test_emit_records_last_good_and_error_path_surfaces_it(tmp_path, monkeypatch, capsys):
    """_emit persists the printed line to LAST_GOOD_PATH; the main() error path
    attaches it as last_good_run context (value stays None — an old number is not
    this run's result)."""
    import json

    import bench

    monkeypatch.setattr(bench, "LAST_GOOD_PATH", str(tmp_path / "last_bench.json"))
    bench._emit(1234.5, {"mfu": 0.03})
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["value"] == 1234.5
    saved = json.loads((tmp_path / "last_bench.json").read_text())
    assert saved["line"]["value"] == 1234.5
    assert saved["recorded_at"] > 0

    # error path: headline measurement raises -> error line carries last_good_run
    monkeypatch.setattr(bench, "measure_ours",
                        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("relay down")))
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        bench.main()
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert err["value"] is None and "relay down" in err["error"]
    assert err["last_good_run"]["line"]["value"] == 1234.5


def test_flag_sweep_run_one_records_rows(monkeypatch):
    """xla_flag_sweep.run_one: parses the last stdout JSON line on success, records
    non-JSON tails and failures as rows instead of raising."""
    import types

    import xla_flag_sweep as sweep

    def fake_run(cmd, **kw):
        return types.SimpleNamespace(returncode=0, stderr="",
                                     stdout='noise\n{"patches_per_sec": 123.0}\n')

    monkeypatch.setattr(sweep.subprocess, "run", fake_run)
    row = sweep.run_one("t", "--some-flag=1")
    assert row["patches_per_sec"] == 123.0 and row["rc"] == 0

    monkeypatch.setattr(sweep.subprocess, "run",
                        lambda cmd, **kw: types.SimpleNamespace(
                            returncode=0, stderr="", stdout="not json at all\n"))
    row = sweep.run_one("t2", "")
    assert "stdout_tail" in row and "patches_per_sec" not in row

    monkeypatch.setattr(sweep.subprocess, "run",
                        lambda cmd, **kw: types.SimpleNamespace(
                            returncode=2, stderr="bad flag", stdout=""))
    row = sweep.run_one("t3", "--bogus")
    assert row["rc"] == 2 and row["stderr_tail"] == "bad flag"


def test_run_bounded_converts_hangs_and_propagates():
    """_run_bounded: a hang becomes TimeoutError even though the worker never
    returns (SIGALRM could not do this from inside a blocking C call); results and
    exceptions pass through unchanged."""
    import time as _time

    import bench
    import pytest as _pytest

    assert bench._run_bounded(lambda: 42, 5, "ok") == 42

    with _pytest.raises(RuntimeError, match="boom"):
        bench._run_bounded(lambda: (_ for _ in ()).throw(RuntimeError("boom")),
                           5, "err")

    t0 = _time.perf_counter()
    with _pytest.raises(TimeoutError, match="hang"):
        bench._run_bounded(lambda: _time.sleep(30), 1, "hang")
    assert _time.perf_counter() - t0 < 5    # did not wait for the worker


def test_main_runs_all_secondaries_and_budget_skips(tmp_path, monkeypatch, capsys):
    """main() enriches the headline with every secondary inside the budget, and
    surfaces '<name>_skipped' markers (still rc=0) when the budget is exhausted —
    the driver's tail line must always be the fullest valid result."""
    import json

    import bench

    monkeypatch.setattr(bench, "LAST_GOOD_PATH", str(tmp_path / "last_bench.json"))
    for var in ("LSHM_BENCH_SKIP_PEAK", "LSHM_BENCH_SKIP_LBFGS", "LSHM_BENCH_SKIP_F32"):
        monkeypatch.delenv(var, raising=False)
    headline = {"patches_per_sec": 1000.0, "mfu": 0.03, "compile_sec": 0.0,
                "compute_dtype": "bfloat16_full"}
    monkeypatch.setattr(bench, "measure_ours", lambda *a, **k: dict(headline))
    monkeypatch.setattr(bench, "measure_ours_eval", lambda: {"eval_pps": 1.0})
    monkeypatch.setattr(bench, "measure_ours_peak",
                        lambda: {"peak_patches_per_sec": 2000.0})
    monkeypatch.setattr(bench, "measure_ours_lbfgs", lambda: {"lbfgs_pps": 3.0})
    monkeypatch.setattr(bench, "measure_ours_f32", lambda: {"f32_pps": 4.0})

    monkeypatch.setattr(bench, "_budget", lambda: 10_000.0)
    bench.main()
    last = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    d = last["detail"]
    assert last["value"] == 1000.0
    assert d["eval_pps"] == 1.0 and d["peak_patches_per_sec"] == 2000.0
    assert d["lbfgs_pps"] == 3.0 and d["f32_pps"] == 4.0

    # exhausted budget: secondaries are skipped with markers, headline still emitted
    monkeypatch.setattr(bench, "_budget", lambda: 29.0)  # below the 30 s reserve
    bench.main()
    last = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    d = last["detail"]
    assert last["value"] == 1000.0
    for name in ("eval", "peak", "lbfgs", "f32"):
        assert d[f"{name}_skipped"] == "wall budget"


def test_trace_cache_cold_warm_identical(tmp_path, monkeypatch):
    """The serialized-export trace cache (bench._compile_step_cached) must produce
    a warm-path step that is numerically IDENTICAL to the cold-path one — the warm
    run deserializes the very StableHLO module the cold run exported, so any
    divergence means the cache is timing a different program."""
    import bench
    from lshm_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from lshm_tpu.models import CascadedAE
    from lshm_tpu.train import LossWeights, init_train_state, make_train_step

    monkeypatch.setattr(bench, "_EXPORT_DIR", str(tmp_path / "exported"))
    monkeypatch.delenv("LSHM_BENCH_TRACE_CACHE", raising=False)

    cfg = Config(
        data=DataConfig(batch_size=2, patch_size=128),
        model=ModelConfig(latent_dim=16, latent_dim_1d=8, num_clusters=3, rica=True),
        train=TrainConfig(admm_iters=1),
    )
    model = CascadedAE(cfg=cfg.model)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 128, 128, 4), jnp.float32)
    uv = jnp.repeat(
        jax.random.normal(jax.random.fold_in(key, 1), (2, 2)), 2, axis=0)

    def build():
        state, tx = init_train_state(model, cfg, key, x, uv)
        step = make_train_step(model, tx, cfg, num_groups=2, donate=False,
                               jit=False)
        return state, step

    state, step = build()
    fs1 = bench._compile_step_cached("t_step", step, state, (x, uv, LossWeights()))
    assert fs1.trace_cache == "cold"
    losses_cold = [fs1.run_chain(1) for _ in range(2)]

    state, step = build()
    fs2 = bench._compile_step_cached("t_step", step, state, (x, uv, LossWeights()))
    assert fs2.trace_cache == "warm"
    losses_warm = [fs2.run_chain(1) for _ in range(2)]

    assert losses_cold == losses_warm
    assert fs2.flops == fs1.flops
