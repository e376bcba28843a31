"""Driver entry-point tests: single-chip compile check + 8-virtual-device dry run."""

import jax
import pytest


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    xrecon, Mu = out
    assert xrecon.shape == (4, 128, 128, 4)
    assert Mu.shape == (4, 256)  # 224 + 16 + 16


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert jax.device_count() >= 8
    ge.dryrun_multichip(8)
