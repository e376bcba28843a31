"""Decompose the L-BFGS ADMM step (88.9 ms/iter f32 vs 14.6 Adam) into components.

VERDICT r3 #1 asks specifically: does the L-BFGS step suffer the same
``lax.while_loop`` body layout/fusion pessimization that cost the ADMM scan 6.4x?
This measures, with the same chained two-point discipline as decompose.py:

  * a single value probe (the line-search closure) straight-line,
  * 3 chained probes straight-line vs THE SAME 3 probes inside a lax.while_loop
    (the ratio is the while-loop pessimization factor for the probe body),
  * value_and_grad straight-line vs inside a while_loop (the outer-iteration body),
  * the composed lbfgs optimizer step and full train step (nadmm=1),
  * the actual func_evals per step (to build the sum-of-parts estimate).

Usage: python benchmarks/lbfgs_decompose.py [--dtype float32] [--batch 420]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (shared flagship setup + cache config)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from decompose import time_fn  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--batch", type=int, default=420)
    ap.add_argument("--only", default=None, help="comma list of component names")
    args = ap.parse_args()

    from lshm_tpu.optim import lbfgs_init, make_lbfgs_step
    from lshm_tpu.train import LossWeights
    from lshm_tpu.train.objective import (
        Duals,
        cascade_objective,
        metrics_and_dual_update,
    )
    from lshm_tpu.train.step import init_lbfgs_train_state, make_lbfgs_train_step

    batch, nbase = args.batch, max(args.batch // 35, 1)
    cfg, model, x, uv, key = bench._flagship_setup(
        batch, nbase, optimizer="lbfgs", compute_dtype=args.dtype
    )
    state = init_lbfgs_train_state(model, cfg, key, x, uv)
    params = state.params
    w = LossWeights()
    duals = Duals.zeros(x.size, x.dtype)

    def value_fn(p):
        return cascade_objective(model, p, x, uv, duals, w, nbase,
                                 use_rica=cfg.model.rica,
                                 khm_order=cfg.model.khm_order)[0]

    vg_fn = jax.value_and_grad(value_fn)

    def perturb(p, v):
        return jax.tree.map(lambda leaf: leaf + (v * 1e-30).astype(leaf.dtype), p)

    # --- straight-line vs while_loop for the SAME chained bodies ------------------
    def probes_chain(p, k):
        v = jnp.zeros((), x.dtype)
        for _ in range(k):
            v = value_fn(perturb(p, v))
        return v

    def probes_while(p, k):
        def cond(c):
            return c[0] < k

        def body(c):
            i, v = c
            return i + 1, value_fn(perturb(p, v))

        return jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32),
                                               jnp.zeros((), x.dtype)))[1]

    def vg_chain(p, k):
        v = jnp.zeros((), x.dtype)
        g = None
        for _ in range(k):
            v, g = vg_fn(perturb(p, v))
            # thread a gradient element into the carry so the intermediate backward
            # passes are data-live (otherwise XLA DCEs every backward but the last)
            v = v + jnp.ravel(jax.tree.leaves(g)[0])[0] * 1e-30
        return v, g

    def vg_while(p, k):
        def cond(c):
            return c[0] < k

        def body(c):
            i, v, _ = c
            v2, g2 = vg_fn(perturb(p, v))
            return i + 1, v2, g2

        g0 = jax.tree.map(jnp.zeros_like, p)
        return jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), jnp.zeros((), x.dtype), g0)
        )[1:]

    # --- composed pieces ----------------------------------------------------------
    def ovalue(p, x, uv, duals, w):
        return cascade_objective(model, p, x, uv, duals, w, nbase,
                                 use_rica=cfg.model.rica,
                                 khm_order=cfg.model.khm_order)[0]

    ovg = jax.value_and_grad(ovalue)
    lbfgs_step = make_lbfgs_step(ovg, ovalue, cfg.optim.lbfgs)

    def lbfgs_once(p):
        st = lbfgs_init(p, cfg.optim.lbfgs)
        res = lbfgs_step(p, st, x, uv, duals, w)
        return res.x

    def metrics_dual(p):
        m, d = metrics_and_dual_update(
            model, p, x, uv, duals, w, nbase,
            use_rica=cfg.model.rica, khm_order=cfg.model.khm_order,
        )
        return m["loss"], d.y1

    import dataclasses

    cfg1 = cfg.replace(train=dataclasses.replace(cfg.train, admm_iters=1))
    train1 = make_lbfgs_train_step(model, cfg1, num_groups=nbase, donate=False,
                                   jit=False)

    components = {
        "value_probe_x1": (lambda p: probes_chain(p, 1), (params,)),
        "value_probes_chain_x3": (lambda p: probes_chain(p, 3), (params,)),
        "value_probes_while_x3": (lambda p: probes_while(p, 3), (params,)),
        # NOTE: return BOTH (v, g) — dropping g here would let XLA dead-code-eliminate
        # the whole backward pass (time_fn keeps the full output alive, but only of
        # what the lambda returns)
        "vg_x1": (lambda p: vg_chain(p, 1), (params,)),
        "vg_chain_x4": (lambda p: vg_chain(p, 4), (params,)),
        "vg_while_x4": (lambda p: vg_while(p, 4), (params,)),
        "metrics_dual_fwd": (metrics_dual, (params,)),
        "lbfgs_opt_step": (lbfgs_once, (params,)),
        "lbfgs_train_step_nadmm1": (
            lambda s: train1(s, x, uv, w)[0].params, (state,)),
    }

    sel = args.only.split(",") if args.only else list(components)
    for name in sel:
        fn, fargs = components[name]
        try:
            r = time_fn(fn, fargs)
        except Exception as e:
            r = {"error": repr(e)[:300]}
        print(json.dumps({"component": name, "batch": batch,
                          "dtype": args.dtype, **r}), flush=True)

    # actual closure-eval count of one optimizer step (drives the sum-of-parts)
    if args.only is None:
        st = lbfgs_init(params, cfg.optim.lbfgs)
        res = jax.jit(lbfgs_step)(params, st, x, uv, duals, w)
        print(json.dumps({
            "component": "func_evals_per_opt_step",
            "value": int(jax.device_get(res.state.func_evals)),
        }), flush=True)


if __name__ == "__main__":
    main()
