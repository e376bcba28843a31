"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding tests run
hermetically (no TPU needed), and provide a session-scoped synthetic H5 fixture."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The session sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon, so
# env-var tweaks here are too late — but jax.config.update works any time before first
# backend use, and XLA_FLAGS is read lazily at CPU-client creation.
# Set LSHM_TEST_TPU=1 to run the suite on real hardware instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("LSHM_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(scope="session")
def synth_h5(tmp_path_factory):
    """A small schema-valid synthetic MS_extract.h5 (passes the scanner validity gate)."""
    from lshm_tpu.data.synthetic import write_synthetic_h5

    path = tmp_path_factory.mktemp("h5data") / "L123456.MS_extract.h5"
    return write_synthetic_h5(str(path), nstations=4, ntime=192, nfreq=192, seed=7)


@pytest.fixture(scope="session")
def synth_h5_dir(synth_h5):
    return os.path.dirname(synth_h5)
