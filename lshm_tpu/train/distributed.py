"""Multi-process (multi-host) bootstrap.

The reference is strictly single-process (SURVEY.md §5: no distributed backend).  Here
multi-host data parallelism composes from three pieces:

1. this bootstrap — ``jax.distributed.initialize`` so every host sees the global device
   set and collectives cross hosts;
2. the per-host sampler stream — ``MinibatchSampler`` folds ``jax.process_index()`` into
   its rng so hosts draw disjoint minibatches (lshm_tpu/data/sampler.py);
3. the sharded train step — GSPMD/shard_map over the global mesh inserts the gradient
   all-reduce (lshm_tpu/train/parallel.py).

Tested hermetically with two CPU processes in tests/test_multihost.py.
"""

from __future__ import annotations

import os


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Initialize multi-process JAX.  Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); a no-op returning 1
    when neither arguments nor env request more than one process.

    Returns the process count after initialization."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if not coordinator and num_processes <= 1:
        return 1
    if not coordinator or num_processes <= 1:
        # exactly one of (coordinator, num_processes>1) was provided: almost certainly
        # a misconfigured multi-host launch — proceeding single-process would train
        # silently divergent replicas, so fail loudly instead
        raise ValueError(
            "incomplete multi-host configuration: need BOTH a coordinator address and "
            f"num_processes > 1 (got coordinator={coordinator!r}, "
            f"num_processes={num_processes})"
        )

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()
