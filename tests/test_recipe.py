"""Miniature replay of the published training recipe (VERDICT r4 item 2).

Drives benchmarks/recipe_run.py --mini end-to-end: 2 epochs (1 Adam @ ramp
0.001, 1 L-BFGS @ 0.01) with alternating groups on small dims, synthetic data,
CPU.  The flagship artifact is benchmarks/recipe_run_report.json (TPU run of
the same script); this test keeps the path green hermetically.
Reference recipe: README.md:24-30 of the reference repo.
"""

import json
import math
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_recipe_mini_replay(tmp_path):
    env = dict(os.environ, LSHM_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "recipe_run.py"),
         "--mini", "--out", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout[out.stdout.index("{"):])
    assert report["mini"] is True
    stages = report["stages"]
    assert [s["optimizer"] for s in stages] == ["adam", "lbfgs"]
    assert stages[0]["alpha"] == 0.001 and stages[1]["alpha"] == 0.01
    # stage walls tile the run: each positive, in-order
    assert all(s["wall_sec_incl_compile"] > 0 for s in stages)
    for k, v in report["final_losses"].items():
        assert math.isfinite(v), (k, v)
    assert report["steps_logged"] == 4          # 2 epochs x 2 iters
    assert os.path.exists(report["figure"])     # the errors.png analog
    assert os.path.exists(os.path.join(report["checkpoint"], "extras_4.json"))
