"""Unit tests for benchmarks/recipe_run.py stage_breakdown: the median-based
steady rate with explicit stall accounting (a transient relay freeze must show up
in stall_sec, not distort the sustained rate), recomputable offline from the
committed train log."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))


def _history(per_iter, iters, patches=24, stall_at=None, stall_len=600.0,
             epoch=0, t0=0.0, compile_sec=30.0):
    """Synthetic trainer history: first record absorbs compile, then steady
    cadence, optionally one multi-minute stall injected at index ``stall_at``."""
    recs = []
    t = t0 + compile_sec
    for i in range(iters):
        if i > 0:
            t += per_iter
        if stall_at is not None and i == stall_at:
            t += stall_len
        recs.append({"epoch": epoch, "t": t, "patches": patches})
    return recs


@pytest.fixture()
def cfg():
    from recipe_run import build_config

    return build_config("/nonexistent", mini=True)   # 2 stages x 1 epoch, nadmm=2


def test_steady_rate_is_median_per_iter(cfg):
    from recipe_run import stage_breakdown

    nadmm = cfg.train.admm_iters
    hist = _history(2.0, 10, epoch=0) + _history(4.0, 10, epoch=1, t0=100.0)
    rows = stage_breakdown(hist, cfg)
    assert len(rows) == 2
    assert rows[0]["steady_sec_per_admm_iter"] == pytest.approx(2.0 / nadmm)
    assert rows[1]["steady_sec_per_admm_iter"] == pytest.approx(4.0 / nadmm)
    assert rows[0]["steady_patches_per_sec"] == pytest.approx(24 * nadmm / 2.0)
    assert rows[0]["stall_iters"] == 0 and rows[0]["stall_sec"] == 0


def test_stall_excluded_from_rate_but_counted(cfg):
    from recipe_run import stage_breakdown

    clean = stage_breakdown(_history(2.0, 20), cfg)[0]
    stalled = stage_breakdown(_history(2.0, 20, stall_at=10, stall_len=600.0),
                              cfg)[0]
    # the stall must NOT move the steady rate...
    assert stalled["steady_sec_per_admm_iter"] == pytest.approx(
        clean["steady_sec_per_admm_iter"])
    # ...but must be fully visible in the stall accounting and the wall
    assert stalled["stall_iters"] == 1
    assert stalled["stall_sec"] == pytest.approx(600.0, rel=0.01)
    assert (stalled["wall_sec_incl_compile"]
            >= clean["wall_sec_incl_compile"] + 599.0)


def test_short_hiccup_below_cutoff_not_a_stall(cfg):
    from recipe_run import stage_breakdown

    # 8 s blip: > 5x median(2 s) but below the 30 s absolute floor -> not a stall
    row = stage_breakdown(_history(2.0, 20, stall_at=10, stall_len=8.0), cfg)[0]
    assert row["stall_iters"] == 0


def test_two_records_no_steady_rate(cfg):
    from recipe_run import stage_breakdown

    row = stage_breakdown(_history(2.0, 2), cfg)[0]
    assert row["steady_patches_per_sec"] is None
