"""Flagship-dims sharded L-BFGS compile certification (VERDICT r4 item 5).

The CPU dryrun certifies sharding CORRECTNESS at reduced dims; this test
certifies the flagship shape (latent 224/16) lowers and executes under GSPMD.
TPU-gated (LSHM_TEST_TPU=1): on the 1-core CPU host the flagship compile blows
every budget, which is exactly why the dryrun runs reduced dims there.
"""

import math
import os

import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("LSHM_TEST_TPU"),
    reason="flagship-dims GSPMD compile needs the real TPU (set LSHM_TEST_TPU=1)",
)


@requires_tpu
@pytest.mark.slow
def test_flagship_sharded_lbfgs_compiles_and_steps():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
    from flagship_shard_compile import run_check

    r = run_check(nadmm=2)
    assert r["backend"] == "tpu", r
    assert math.isfinite(r["loss_after_one_step"]), r
    assert r["func_evals"] > 0, r
