"""KHM loss backend comparison (Pallas fused kernel vs XLA expression) — HONEST timing.

Round 2 recorded a 32-37x standalone win for the Pallas kernel; that number was a
dispatch-rate artifact (VERDICT round 2).  This re-measures both backends with the
chained two-point method from benchmarks/decompose.py, standalone (loss+grad of the
KHM terms alone on flagship-sized latents) and writes
benchmarks/khm_backend_compare.json.

Usage: python benchmarks/khm_compare.py [--n 420] [--latent 256] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import decompose  # noqa: E402  (chained two-point timer)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=420)
    ap.add_argument("--latent", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__),
                                                  "khm_backend_compare.json"))
    args = ap.parse_args()

    from lshm_tpu.kernels import khm_loss_fused
    from lshm_tpu.losses import khm_loss

    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (args.n, args.latent), jnp.float32)
    M = jax.random.normal(jax.random.fold_in(key, 1), (args.k, args.latent),
                          jnp.float32)

    def fn_for(backend):
        if backend == "xla":
            return lambda Xin: jax.grad(
                lambda m: khm_loss(Xin, m, args.order))(M)
        return lambda Xin: jax.grad(
            lambda m: khm_loss_fused(Xin, m, args.order, force="pallas"))(M)

    rows = {}
    for backend in ("xla", "pallas"):
        try:
            # many calls per point: the loss+grad is microseconds of device work at
            # flagship sizes, so small n would measure dispatch noise (negative
            # marginals observed at n=420 with n2=8)
            rows[backend] = decompose.time_fn(fn_for(backend), (X,), n1=8, n2=64)
        except Exception as e:
            rows[backend] = {"error": repr(e)[:300]}

    report = {
        "n": args.n, "latent": args.latent, "k": args.k,
        "timing_method": "chained two-point host-scalar-fetch (see decompose.py)",
        "device": str(jax.devices()[0]),
        "backends": rows,
    }
    if all("sec_per_call" in r for r in rows.values()):
        report["pallas_speedup_vs_xla"] = (
            rows["xla"]["sec_per_call"] / rows["pallas"]["sec_per_call"]
        )
    print(json.dumps(report), flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
