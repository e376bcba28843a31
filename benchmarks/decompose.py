"""Decompose the flagship ADMM step's 1.1 s/call execution time into components.

Round-3 honest timing found the compiled step at ~0.04% MFU (bench.py two-point
method).  The XLA profiler may be unavailable through the relay, so this locates the
time sink by timing each piece of the program separately with the same
completion-forcing two-point method: the three AE forwards, their backward passes,
the loss heads, the optimizer update, the dual update, plus a large-matmul
calibration of what the chip can actually sustain through this backend.

Prints one JSON line per component, incrementally.

Usage: python benchmarks/decompose.py [--dtype float32] [--batch 420]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (shared flagship setup + cache config)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _perturb_first_float_leaf(tree, carry):
    """Thread ``carry`` into one float leaf of ``tree``: a true data dependency, so
    repeated calls SERIALIZE on device.  Independent repeats are overlapped/reordered
    by this backend and time as impossible TFLOP/s (554 observed for a 197-peak chip),
    so chaining is mandatory.  carry*1e-30 changes values by <=1 ulp-ish noise."""
    leaves, treedef = jax.tree.flatten(tree)
    out, done = [], False
    for leaf in leaves:
        if (not done and hasattr(leaf, "dtype")
                and jnp.issubdtype(leaf.dtype, jnp.floating)):
            out.append(leaf + (carry * 1e-30).astype(leaf.dtype))
            done = True
        else:
            out.append(leaf)
    return jax.tree.unflatten(treedef, out)


def time_fn(fn, args, n1: int = 2, n2: int = 8, reps: int = 3,
            min_window: float = 0.05) -> dict:
    """Two-point honest timing of fn(*args): marginal sec/call, RTT-free, with the
    calls chained through a carry scalar so the device must run them serially.

    ``min_window``: if the n2 run finishes faster than this (sub-resolution ops return
    garbage marginals, even negative), n1/n2 are scaled up until the window is wide
    enough for the relay's ~0.1-0.5 ms host-timer noise to be negligible."""

    def chained(carry, *a):
        a = (_perturb_first_float_leaf(a[0], carry),) + tuple(a[1:])
        out = fn(*a)
        new_carry = jnp.ravel(jnp.asarray(jax.tree.leaves(out)[0]))[0]
        # return the FULL output: a carry-only return lets XLA dead-code-eliminate
        # the workload down to the one element the carry touches
        return new_carry.astype(jnp.float32), out

    carry0 = jnp.zeros((), jnp.float32)
    compiled = jax.jit(chained).lower(carry0, *args).compile()
    flops = bench._cost_flops(compiled)
    carry, _ = compiled(carry0, *args)
    float(jax.device_get(carry))          # warmup + completion

    def run(n):
        c = carry0
        t0 = time.perf_counter()
        for _ in range(n):
            c, _ = compiled(c, *args)
        float(jax.device_get(c))          # blocks until the whole chain executed
        return time.perf_counter() - t0

    # widen the window for tiny ops so timer noise can't produce negative marginals
    probe = run(n2)
    while probe < min_window and n2 < 4096:
        n1, n2 = n1 * 4, n2 * 4
        probe = run(n2)

    # single implementation of the marginal fit + noise fallback (bench.py owns it)
    sec, _, n2, noise_fallback = bench._two_point_marginal(
        run, n1, n2, reps, min_window=min_window
    )
    r = {"sec_per_call": sec, "flops": flops, "n1": n1, "n2": n2}
    if noise_fallback:
        r["noise_fallback"] = True
    if flops:
        r["tflops_per_sec"] = flops / sec / 1e12
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--batch", type=int, default=420)
    ap.add_argument("--only", default=None, help="comma list of component names")
    args = ap.parse_args()

    from lshm_tpu.train import LossWeights, init_train_state, make_train_step
    from lshm_tpu.train.objective import Duals, cascade_objective, dual_update

    batch, nbase = args.batch, max(args.batch // 35, 1)
    cfg, model, x, uv, key = bench._flagship_setup(batch, nbase,
                                                   compute_dtype=args.dtype)
    state, tx = init_train_state(model, cfg, key, x, uv)
    params = state.params
    w = LossWeights()
    duals = Duals.zeros(x.size, x.dtype)

    def objective(p):
        return cascade_objective(model, p, x, uv, duals, w, nbase,
                                 use_rica=cfg.model.rica,
                                 khm_order=cfg.model.khm_order)[0]

    n = 4096
    a = jax.random.normal(key, (n, n), jnp.float32)

    def forward(p):
        return model.apply(p, x, uv).xrecon

    def fwd_2d(p):
        # encoder+decoder of the 2D AE alone
        return model.apply(p, x, uv, method=lambda m, x, uv: m.ae2d(x, uv))[0]

    def value_grad(p):
        return jax.grad(objective)(p)

    def adam_update(p):
        g = jax.tree.map(jnp.ones_like, p)
        upd, _ = tx.update(g, state.opt_state, p)
        return upd

    def dual_fwd(p):
        return dual_update(model, p, x, uv, duals, w.rho).y1

    def fwd_1d(p):
        # one 1D AE alone on the time-major vectorized residual shape
        iy = x.reshape(x.shape[0], -1, x.shape[-1])
        return model.apply(p, iy, uv, method=lambda m, s, uv: m.aeT(s, uv))[0]

    step10 = make_train_step(model, tx, cfg, num_groups=nbase, donate=False, jit=False)
    cfg1 = cfg.replace(train=__import__("dataclasses").replace(cfg.train, admm_iters=1))
    step1 = make_train_step(model, tx, cfg1, num_groups=nbase, donate=False, jit=False)

    def grad_2d_only(p):
        def loss(p):
            x1 = model.apply(p, x, uv, method=lambda m, x, uv: m.ae2d(x, uv))[0]
            return jnp.sum((x1 - x) ** 2)
        return jax.grad(loss)(p)

    def grad_1d_only(p):
        iy = x.reshape(x.shape[0], -1, x.shape[-1])
        def loss(p):
            y = model.apply(p, iy, uv, method=lambda m, s, uv: m.aeT(s, uv))[0]
            return jnp.sum((y - iy) ** 2)
        return jax.grad(loss)(p)

    components = {
        "matmul_4096_f32": (lambda A: A @ A, (a,)),
        "train_step_nadmm10": (lambda s: step10(s, x, uv, w)[0].params, (state,)),
        "train_step_nadmm1": (lambda s: step1(s, x, uv, w)[0].params, (state,)),
        "forward_1d_only": (fwd_1d, (params,)),
        "grad_2d_only": (grad_2d_only, (params,)),
        "grad_1d_only": (grad_1d_only, (params,)),
        "matmul_4096_bf16": (
            lambda A: (A.astype(jnp.bfloat16) @ A.astype(jnp.bfloat16)), (a,)),
        "forward_cascade": (forward, (params,)),
        "forward_2d_only": (fwd_2d, (params,)),
        "objective_value": (objective, (params,)),
        "objective_grad": (value_grad, (params,)),
        "adam_update": (adam_update, (params,)),
        "dual_update_fwd": (dual_fwd, (params,)),
    }
    # --- layout / bandwidth probes: where does the conv stack's time actually go? ---
    from jax import lax

    kk = jax.random.fold_in(key, 7)
    W2d = 0.1 * jax.random.normal(kk, (4, 4, 4, 8), jnp.float32)       # HWIO
    W1d = 0.1 * jax.random.normal(kk, (4, 4, 8), jnp.float32)          # WIO
    Wt2d = 0.1 * jax.random.normal(kk, (4, 4, 8, 4), jnp.float32)
    x1d = x.reshape(x.shape[0], -1, x.shape[-1])                       # [N, 16384, C]
    h8 = jnp.zeros((x.shape[0], 64, 64, 8), jnp.float32)

    components.update({
        # elementwise on the NHWC input (C=4 minor: lane-padded layout?) vs a
        # lane-friendly flattening of the same bytes
        "copy_nhwc_c4": (lambda t: t + 1.0, (x,)),
        "copy_flat_512": (lambda t: t + 1.0, (x.reshape(x.shape[0] * 128, -1),)),
        # single first-layer convs, isolated
        "conv2d_l1_alone": (
            lambda t: lax.conv_general_dilated(
                t, W2d, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")), (x,)),
        "conv1d_l1_alone": (
            lambda t: lax.conv_general_dilated(
                t, W1d, (4,), ((1, 1),),
                dimension_numbers=("NWC", "WIO", "NWC")), (x1d,)),
        "tconv2d_last_alone": (
            lambda t: lax.conv_transpose(
                t, Wt2d, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")), (h8,)),
    })

    sel = args.only.split(",") if args.only else list(components)
    for name in sel:
        fn, fargs = components[name]
        try:
            r = time_fn(fn, fargs)
        except Exception as e:
            r = {"error": repr(e)[:300]}
        print(json.dumps({"component": name, "batch": batch,
                          "dtype": args.dtype, **r}), flush=True)


if __name__ == "__main__":
    main()
