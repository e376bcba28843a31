"""Cluster-assignment parity vs the reference (BASELINE.md: NMI >= 0.95).

Runs the full protocol of benchmarks/parity_nmi.py: brief reference training on synthetic
data, checkpoint import, per-baseline assignments computed with the reference's own torch
eval math and with our batched evaluator, NMI between them.
"""

import os
import sys

import pytest

REF = "/root/reference/src"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]


def test_cluster_assignment_nmi():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "benchmarks"))
    import parity_nmi

    score = parity_nmi.main(iters=10, seed=0, nstations=5, variant="cascade")
    assert score >= 0.95, score


def test_cluster_assignment_nmi_fourier():
    """Same protocol on the legacy Fourier pipeline (net/fnet/khm trio)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "benchmarks"))
    import parity_nmi

    score = parity_nmi.main(iters=10, seed=0, nstations=5, variant="fourier")
    assert score >= 0.95, score
