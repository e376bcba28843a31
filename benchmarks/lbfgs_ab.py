"""Same-session A/B of L-BFGS step variants on the flagship closure (TPU).

Times one full optimizer.step(closure) (max_iter=4, batch-mode Armijo) per variant
with the chained two-point method:

  * while:    outer iteration as lax.while_loop (the default lowering)
  * unroll:   outer iteration unrolled with done-masking (LBFGSConfig.unroll_outer;
              measured composed-neutral 2026-08-19, kept as alternative lowering)
  * group-*:  structural-freeze closure for an alternating-update group
              ("khm" / "ae1d" / "ae2d") — frozen subtrees substituted with a
              loop-invariant snapshot so XLA hoists their forward out of the probes
              (the round-4 make_lbfgs_train_step lowering)
  * masked-*: pre-round-4 group lowering (full-tree closure, zeroed frozen grads),
              the control for group-*.

Usage: python benchmarks/lbfgs_ab.py [--batch 420] [--only while,unroll,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402
import jax  # noqa: E402
from decompose import time_fn  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=420)
    ap.add_argument("--only", default=None)
    ap.add_argument("--diag", action="store_true",
                    help="also report func_evals + f32 loss after one step "
                         "(second compile per variant)")
    args = ap.parse_args()

    from lshm_tpu.optim import lbfgs_init, make_lbfgs_step
    from lshm_tpu.train import LossWeights
    from lshm_tpu.train.objective import Duals, cascade_objective
    from lshm_tpu.train.schedule import group_mask
    from lshm_tpu.train.step import init_lbfgs_train_state

    batch, nbase = args.batch, max(args.batch // 35, 1)
    cfg, model, x, uv, key = bench._flagship_setup(batch, nbase, optimizer="lbfgs")
    state = init_lbfgs_train_state(model, cfg, key, x, uv)
    params = state.params
    w = LossWeights()
    duals = Duals.zeros_like(x)

    def make_value_fn(mdl):
        def value_fn(p, x, uv, duals, w):
            return cascade_objective(mdl, p, x, uv, duals, w, nbase,
                                     use_rica=cfg.model.rica,
                                     khm_order=cfg.model.khm_order)[0]
        return value_fn

    value_fn = make_value_fn(model)

    def vg_fn(p, x, uv, duals, w):
        return jax.value_and_grad(value_fn)(p, x, uv, duals, w)

    # mixed-precision closure: compute_dtype="bfloat16" (bf16 conv/dense activations,
    # f32 residual/loss path — NOT the bf16_full mode whose bf16 loss noise blew up
    # func_evals 6.8x, PERF_NOTES round-3).  The Armijo sufficient-decrease test
    # still compares f32 losses; only the eval itself gets cheaper.
    def bf16_fns():
        import dataclasses as dc

        from lshm_tpu.models import CascadedAE

        mcfg = dc.replace(cfg.model, compute_dtype="bfloat16")
        mdl = CascadedAE(cfg=mcfg)
        vf = make_value_fn(mdl)

        def vg(p, x, uv, duals, w):
            return jax.value_and_grad(vf)(p, x, uv, duals, w)
        return vg, vf

    def opt_step(lcfg, vg, vf, *extra):
        step = make_lbfgs_step(vg, vf, lcfg)

        def run(p):
            st = lbfgs_init(p, lcfg)
            res = step(p, st, x, uv, duals, w, *extra)
            return res.x, res.state.func_evals
        return run

    def group_fns(group):
        def subst(p, frozen):
            m = group_mask(p, group)
            return jax.tree.map(lambda v, fz, keep: v if keep else fz, p, frozen, m)

        def vfg(p, x, uv, duals, w, frozen):
            return value_fn(subst(p, frozen), x, uv, duals, w)

        def vgg(p, x, uv, duals, w, frozen):
            return jax.value_and_grad(vfg)(p, x, uv, duals, w, frozen)
        return vgg, vfg

    def masked_fns(group):
        # pre-round-4 group lowering: full-tree closure + zeroed frozen gradients
        def vgm(p, x, uv, duals, w):
            v, g = jax.value_and_grad(value_fn)(p, x, uv, duals, w)
            m = group_mask(p, group)
            return v, jax.tree.map(
                lambda leaf, keep: leaf if keep else jax.numpy.zeros_like(leaf), g, m
            )
        return vgm, value_fn

    lc = cfg.optim.lbfgs
    variants = {
        "while": lambda: opt_step(
            dataclasses.replace(lc, unroll_outer=False), vg_fn, value_fn),
        "unroll": lambda: opt_step(
            dataclasses.replace(lc, unroll_outer=True), vg_fn, value_fn),
        "bf16": lambda: opt_step(lc, *bf16_fns()),
    }
    for g in ("khm", "ae1d", "ae2d"):
        variants[f"group-{g}"] = (lambda g=g: opt_step(lc, *group_fns(g), params))
        variants[f"masked-{g}"] = (lambda g=g: opt_step(lc, *masked_fns(g)))

    sel = args.only.split(",") if args.only else list(variants)
    for name in sel:
        fn = variants[name]()
        try:
            r = time_fn(fn, (params,))
            if args.diag:
                # one un-timed step for the optimizer's own diagnostics: closure-eval
                # count and the accepted loss in a COMMON f32 objective (convergence
                # sanity across dtypes).  Costs a second compile of the step program.
                xn, fe = jax.jit(fn)(params)
                r["func_evals"] = int(jax.device_get(fe))
                r["loss_after_step"] = float(jax.device_get(
                    jax.jit(value_fn)(xn, x, uv, duals, w)))
        except Exception as e:  # pragma: no cover
            r = {"error": repr(e)[:300]}
        print(json.dumps({"variant": name, "batch": batch, **r}), flush=True)


if __name__ == "__main__":
    main()
