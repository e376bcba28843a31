"""Jittable stochastic L-BFGS with on-device line search.

A ground-up JAX re-implementation of the reference's improved L-BFGS
(reference: src/lbfgsnew.py:9-759) with identical algorithmic semantics:

- two-loop recursion over a bounded curvature history with the acceptance test
  ``y.s > 1e-10 ||s||^2`` and initial scaling ``H_diag = y.s / y.y``
  (reference: src/lbfgsnew.py:610-651);
- **batch mode** (stochastic): trust-region damping ``y += lm0 * s``
  (reference :586-587) and an online inter-batch mean/variance estimate of the gradient
  that adapts the maximum line-search step
  ``alphabar = 1 / (1 + sum(var) / ((n_iter - 1) * ||g||))`` (reference :592-607);
- **backtracking (Armijo) line search** with a negative-step retry for batch mode
  (reference :115-187);
- **cubic / strong-Wolfe line search** (Fletcher bracket + zoom, directional derivatives
  by central finite differences of the closure) for full-batch mode (reference :192-495);
- the same step-size seeding, NaN guards, and termination tests (reference :498-759).

Two TPU-critical design points:

1. The reference's line searches call ``float(closure())`` per probe — a host<->device
   sync every evaluation, dozens per step.  Here the *entire* step, line searches
   included, is one compiled XLA program built from ``lax.while_loop``s.
2. Parameters are handled as **native pytrees** (a bare array works too — it is a
   pytree).  An earlier flat-vector design paid ~15x per closure evaluation for
   ravel/unravel materialization at reference scale; tree-wise axpy/dot keeps every
   closure evaluation as cheap as the plain pytree training step.
"""

from __future__ import annotations

import operator
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from lshm_tpu.config import LBFGSConfig

# ----------------------------------------------------------------------------------
# pytree vector algebra
# ----------------------------------------------------------------------------------


def _tdot(a, b) -> jnp.ndarray:
    return jax.tree.reduce(
        operator.add, jax.tree.map(lambda x, y: jnp.vdot(x, y), a, b)
    )


def _tabs_sum(a) -> jnp.ndarray:
    return jax.tree.reduce(operator.add, jax.tree.map(lambda x: jnp.sum(jnp.abs(x)), a))


def _taxpy(x, alpha, d):
    """x + alpha * d (alpha scalar)."""
    return jax.tree.map(lambda xi, di: xi + alpha * di, x, d)


def _tsub(a, b):
    return jax.tree.map(operator.sub, a, b)


def _tscale(a, alpha):
    return jax.tree.map(lambda x: alpha * x, a)


def _tzeros_like(a):
    return jax.tree.map(jnp.zeros_like, a)


def _tselect(pred, a, b):
    """Elementwise where with a scalar predicate over two trees."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def _dtype_of(a):
    return jax.tree.leaves(a)[0].dtype


class LBFGSState(struct.PyTreeNode):
    """Persistent optimizer state (survives across minibatch steps, like the reference's
    optimizer ``state`` dict; reference: src/lbfgsnew.py:743-756).

    The curvature history is a pointer-based circular buffer stored per parameter leaf
    (leading dim m): pushes write ONE row per leaf via dynamic_update_slice, and no
    history-sized buffer flows through a lax.cond join."""

    s_hist: Any                  # tree of [m, *leaf] recent steps s_i = t * d (circular)
    y_hist: Any                  # tree of [m, *leaf] recent gradient differences
    hist_ptr: jnp.ndarray        # [] int32 next write slot
    hist_count: jnp.ndarray      # [] int32 number of valid pairs
    H_diag: jnp.ndarray          # [] initial inverse-Hessian scale
    prev_grad: Any               # tree like params
    prev_loss: jnp.ndarray       # []
    d: Any                       # tree: last search direction
    t: jnp.ndarray               # [] last step size
    n_iter: jnp.ndarray          # [] int32 global iteration counter
    running_avg: Any             # tree: online mean of inter-batch gradients
    running_avg_sq: Any          # tree: online second central moment accumulator
    alphabar: jnp.ndarray        # [] adaptive max step (batch mode)
    func_evals: jnp.ndarray      # [] int32 cumulative closure evaluations


def lbfgs_init(params_or_n, cfg: LBFGSConfig, dtype=jnp.float32) -> LBFGSState:
    """``params_or_n``: a params pytree template, or an int n for a flat [n] vector."""
    template = (
        jnp.zeros((params_or_n,), dtype)
        if isinstance(params_or_n, int)
        else jax.tree.map(jnp.zeros_like, params_or_n)
    )
    m = cfg.history_size
    hist = jax.tree.map(lambda z: jnp.zeros((m, *z.shape), z.dtype), template)
    fdtype = _dtype_of(template)
    return LBFGSState(
        s_hist=hist,
        y_hist=jax.tree.map(jnp.copy, hist),
        hist_ptr=jnp.zeros((), jnp.int32),
        hist_count=jnp.zeros((), jnp.int32),
        H_diag=jnp.ones((), fdtype),
        prev_grad=template,
        prev_loss=jnp.zeros((), fdtype),
        d=jax.tree.map(jnp.copy, template),
        t=jnp.asarray(cfg.lr, fdtype),
        n_iter=jnp.zeros((), jnp.int32),
        running_avg=jax.tree.map(jnp.copy, template),
        running_avg_sq=jax.tree.map(jnp.copy, template),
        alphabar=jnp.asarray(cfg.lr, fdtype),
        func_evals=jnp.zeros((), jnp.int32),
    )


def _push_history(state: LBFGSState, s, y, accept) -> LBFGSState:
    """Conditionally write (s, y) at the circular pointer — one row write per leaf
    either way, never a full-buffer shift or a big cond-join copy."""
    ptr = state.hist_ptr
    m = jax.tree.leaves(state.s_hist)[0].shape[0]

    def write(hist_leaf, new_leaf):
        cur = jax.lax.dynamic_index_in_dim(hist_leaf, ptr, 0, keepdims=False)
        row = jnp.where(accept, new_leaf, cur)
        return jax.lax.dynamic_update_slice_in_dim(hist_leaf, row[None], ptr, 0)

    return state.replace(
        s_hist=jax.tree.map(write, state.s_hist, s),
        y_hist=jax.tree.map(write, state.y_hist, y),
        hist_ptr=jnp.where(accept, (ptr + 1) % m, ptr),
        hist_count=jnp.where(
            accept, jnp.minimum(state.hist_count + 1, m), state.hist_count
        ),
    )


def _gather(hist, idx):
    return jax.tree.map(
        lambda h: jax.lax.dynamic_index_in_dim(h, idx, 0, keepdims=False), hist
    )


def _two_loop(g, s_hist, y_hist, hist_ptr, hist_count, H_diag):
    """L-BFGS two-loop recursion over the masked circular history
    (reference: src/lbfgsnew.py:637-651).  Newest pair is at (ptr - 1) % m; m is small
    and static so both passes unroll to straight-line code."""
    m = jax.tree.leaves(s_hist)[0].shape[0]
    q = _tscale(g, -1.0)
    al = []
    for i in range(m):                                      # newest -> oldest
        idx = (hist_ptr - 1 - i) % m
        valid = i < hist_count
        s_i = _gather(s_hist, idx)
        y_i = _gather(y_hist, idx)
        rho_i = 1.0 / _tdot(y_i, s_i)
        a_i = jnp.where(valid, rho_i * _tdot(s_i, q), 0.0)
        q = _taxpy(q, -a_i, y_i)                            # a_i == 0 when invalid
        al.append((idx, a_i))
    r = _tscale(q, H_diag)
    for i in range(m - 1, -1, -1):                          # oldest -> newest
        idx, a_i = al[i]
        valid = i < hist_count
        s_i = _gather(s_hist, idx)
        y_i = _gather(y_hist, idx)
        rho_i = 1.0 / _tdot(y_i, s_i)
        be = jnp.where(valid, rho_i * _tdot(y_i, r), 0.0)
        coef = jnp.where(valid, a_i - be, 0.0)
        r = _taxpy(r, coef, s_i)
    return r


# ----------------------------------------------------------------------------------
# line searches (value-only closure; fully on-device)
# ----------------------------------------------------------------------------------

def _linesearch_backtrack(value_fn, x, d, g, alphabar, cfg: LBFGSConfig, f_old):
    """Armijo backtracking with negative-step retry (reference: src/lbfgsnew.py:115-187).
    ``f_old`` is the already-known loss at x (the reference re-evaluates the closure for
    it — same value, one full forward wasted).  Returns (alpha, n_evals) where n_evals
    reproduces the reference's ``state['func_evals'] += ci`` accounting exactly: only
    halvings count, not the initial probes (reference :186)."""
    c1 = cfg.ls_c1
    citer = cfg.ls_max_steps
    prodterm = c1 * _tdot(g, d)

    def probe(alpha):
        return value_fn(_taxpy(x, alpha, d))

    def halve_while(alpha0, ci0):
        f0 = probe(alpha0)

        def cond(c):
            ci, alpha, f_new = c
            bad = jnp.isnan(f_new) | (f_new > f_old + alpha * prodterm)
            return (ci < citer) & bad

        def body(c):
            ci, alpha, _ = c
            alpha = 0.5 * alpha
            return ci + 1, alpha, probe(alpha)

        return jax.lax.while_loop(cond, body, (ci0, alpha0, f0))

    ci, alphak, f_new = halve_while(alphabar, 0)

    def try_negative(args):
        ci, alphak, f_new = args
        ci2, alphak1, f_new1 = halve_while(-alphabar, ci)
        better = f_new1 < f_new
        return jnp.where(better, alphak1, alphak), ci2

    def keep(args):
        ci, alphak, _ = args
        return alphak, ci

    alphak, ci = jax.lax.cond(
        (f_old - f_new) < jnp.abs(prodterm), try_negative, keep, (ci, alphak, f_new)
    )
    return alphak, ci


def _cubic_min(value_fn, x, d, a, b, step):
    """Cubic interpolation on [a, b] with finite-difference derivatives
    (reference: src/lbfgsnew.py:319-405).  Returns (alpha, n_evals) where n_evals
    reproduces the reference's accounting: 6 derivative probes + 1 for the in-range
    cubic-minimum probe; the degenerate denom==0 early return counts 0
    (reference :361-402, early return at :368-369 precedes the counter update)."""
    phi = lambda t: value_fn(_taxpy(x, t, d))
    f0 = phi(a)
    f0d = (phi(a + step) - phi(a - step)) / (2.0 * step)
    f1 = phi(b)
    f1d = (phi(b + step) - phi(b - step)) / (2.0 * step)

    aa = 3.0 * (f0 - f1) / (b - a) + f1d - f0d
    disc = aa * aa - f0d * f1d
    six = jnp.asarray(6, jnp.int32)

    def pos_branch(_):
        cc = jnp.sqrt(disc)
        denom = f1d - f0d + 2.0 * cc
        z0 = b - (f1d + cc - aa) * (b - a) / jnp.where(denom == 0.0, 1.0, denom)
        hi = jnp.maximum(a, b)
        lo = jnp.minimum(a, b)
        in_range = (z0 <= hi) & (z0 >= lo)
        # reference quirk kept: the probe point is a + z0*(b-a), not z0 itself
        fz0 = jnp.where(in_range, phi(a + z0 * (b - a)), f0 + f1)
        out = jnp.where(
            (f0 < f1) & (f0 < fz0), a, jnp.where(f1 < fz0, b, z0)
        )
        ev = jnp.where(denom == 0.0, 0, six + in_range.astype(jnp.int32))
        return jnp.where(denom == 0.0, 0.5 * (a + b), out), ev

    def neg_branch(_):
        return jnp.where(f0 < f1, a, b), six

    return jax.lax.cond(disc > 0.0, pos_branch, neg_branch, None)


def _linesearch_zoom(value_fn, x, d, a, b, phi_0, gphi_0, step, cfg: LBFGSConfig):
    """Fletcher zoom (reference: src/lbfgsnew.py:412-495)."""
    sigma, rho_ls = cfg.cubic_sigma, cfg.cubic_rho
    t2, t3 = cfg.cubic_t2, cfg.cubic_t3
    phi = lambda t: value_fn(_taxpy(x, t, d))

    def cond(c):
        ci, aj, bj, alphaj, found, ev = c
        return (ci < 4) & (~found)

    def body(c):
        ci, aj, bj, alphaj_prev, found, ev = c
        p01 = aj + t2 * (bj - aj)
        p02 = bj - t3 * (bj - aj)
        alphaj, cev = _cubic_min(value_fn, x, d, p01, p02, step)
        phi_j = phi(alphaj)
        phi_aj = phi(aj)

        armijo_fail = (phi_j > phi_0 + rho_ls * alphaj * gphi_0) | (phi_j >= phi_aj)

        def fail_case(_):
            return aj, alphaj, alphaj, False  # bj <- alphaj

        def ok_case(_):
            gphi_j = (phi(alphaj + step) - phi(alphaj - step)) / (2.0 * step)
            stop = ((aj - alphaj) * gphi_j <= step) | (
                jnp.abs(gphi_j) <= -sigma * gphi_0
            )
            bj_new = jnp.where(gphi_j * (bj - aj) >= 0.0, aj, bj)
            return jnp.where(stop, aj, alphaj), jnp.where(stop, bj, bj_new), alphaj, stop

        aj2, bj2, alphaj_out, found2 = jax.lax.cond(armijo_fail, fail_case, ok_case, None)
        # on fail: aj unchanged, bj = alphaj; on ok: aj = alphaj unless stopping
        aj_next = jnp.where(armijo_fail, aj, jnp.where(found2, aj, alphaj))
        bj_next = jnp.where(armijo_fail, alphaj, bj2)
        # reference accounting (src/lbfgsnew.py:453,468): interpolation probes + the
        # 2 phi probes every iteration + 2 derivative probes on the non-Armijo path
        ev = ev + cev + 2 + 2 * (1 - armijo_fail.astype(jnp.int32))
        return ci + 1, aj_next, bj_next, alphaj_out, found2, ev

    _, _, _, alphak, _, ev = jax.lax.while_loop(
        cond, body, (0, a, b, a, False, jnp.asarray(0, jnp.int32))
    )
    return alphak, ev


def _linesearch_cubic(value_fn, x, d, cfg: LBFGSConfig, lr, fdtype, phi_0):
    """Strong-Wolfe cubic line search, full-batch mode
    (reference: src/lbfgsnew.py:192-316).  ``phi_0`` is the already-known loss at x.
    Returns (alpha, n_evals)."""
    step = cfg.cubic_step
    sigma, rho_ls, t1 = cfg.cubic_sigma, cfg.cubic_rho, cfg.cubic_t1
    alpha1 = 10.0 * lr
    phi = lambda t: value_fn(_taxpy(x, t, d))

    tol = jnp.minimum(phi_0 * 0.01, 1e-6)
    gphi_0 = (phi(step) - phi(-step)) / (2.0 * step)
    mu = (tol - phi_0) / (rho_ls * gphi_0)

    def search(_):
        def cond(c):
            ci, alphai, alphai1, phi_prev, alphak, done, ev = c
            return (ci < 4) & (~done)

        def body(c):
            ci, alphai, alphai1, phi_prev, alphak, done, ev = c
            phi_i = phi(alphai)

            # condition 0: below tolerance
            c0 = phi_i < tol
            # condition 1: bracket [alphai1, alphai]
            c1 = (phi_i > phi_0 + alphai * gphi_0) | ((ci > 1) & (phi_i >= phi_prev))

            zero = jnp.asarray(0, jnp.int32)

            def early(_):
                """c0 or c1 hit: no derivative probe needed; zoom only for c1."""
                alphak_new, zev = jax.lax.cond(
                    c0,
                    lambda _: (alphai, zero),
                    lambda _: _linesearch_zoom(
                        value_fn, x, d, alphai1, alphai, phi_0, gphi_0, step, cfg
                    ),
                    None,
                )
                return alphak_new, alphai, alphai1, True, zev

            def late(_):
                gphi_i = (phi(alphai + step) - phi(alphai - step)) / (2.0 * step)
                c2 = jnp.abs(gphi_i) <= -sigma * gphi_0
                c3 = gphi_i >= 0.0

                def stop23(_):
                    # reference: breaking at c2/c3 does not count this iteration's
                    # probes (the `closure_evals += 3` at :306 is never reached)
                    ak, zev = jax.lax.cond(
                        c2,
                        lambda _: (alphai, zero),
                        lambda _: _linesearch_zoom(
                            value_fn, x, d, alphai, alphai1, phi_0, gphi_0, step, cfg
                        ),
                        None,
                    )
                    return ak, alphai, alphai1, True, zev

                def advance(_):
                    # next interval (reference :294-301); the advancing path counts
                    # its 3 probes (reference :306) + the interpolation's own evals
                    use_mu = mu <= (2.0 * alphai - alphai1)

                    def interp(_):
                        lo = 2.0 * alphai - alphai1
                        hi = jnp.minimum(mu, alphai + t1 * (alphai - alphai1))
                        return _cubic_min(value_fn, x, d, lo, hi, step)

                    ai_next, iev = jax.lax.cond(
                        use_mu, lambda _: (mu, zero), interp, None
                    )
                    ai1_next = jnp.where(use_mu, alphai, alphai1)
                    return alphak, ai_next, ai1_next, False, iev + 3

                return jax.lax.cond(c2 | c3, stop23, advance, None)

            alphak_new, alphai_next, alphai1_next, stop, bev = jax.lax.cond(
                c0 | c1, early, late, None
            )
            return (ci + 1, alphai_next, alphai1_next, phi_i, alphak_new, stop,
                    ev + bev)

        init = (1, alpha1, 0.0, phi_0, jnp.asarray(lr, fdtype), False,
                jnp.asarray(3, jnp.int32))   # reference :243: phi_0 + 2 gphi_0 probes
        _, _, _, _, alphak, done, ev = jax.lax.while_loop(cond, body, init)
        return jnp.where(done, alphak, jnp.asarray(lr, fdtype)), ev

    # degenerate-derivative guards (reference :232-238): return 1.0; the early returns
    # precede the reference's counter update, so they count 0 evals
    bad = (jnp.abs(gphi_0) < 1e-12) | jnp.isnan(mu)
    return jax.lax.cond(
        bad,
        lambda _: (jnp.ones((), fdtype), jnp.asarray(0, jnp.int32)),
        search,
        None,
    )


# ----------------------------------------------------------------------------------
# the optimizer step
# ----------------------------------------------------------------------------------

class LBFGSResult(NamedTuple):
    x: Any
    state: LBFGSState
    loss: jnp.ndarray


def make_lbfgs_step(
    value_and_grad_fn_outer: Callable[..., tuple[jnp.ndarray, Any]],
    value_fn_outer: Callable[..., jnp.ndarray],
    cfg: LBFGSConfig,
) -> Callable[..., LBFGSResult]:
    """Build the jittable step: one call = one ``optimizer.step(closure)`` of the
    reference — up to ``max_iter`` L-BFGS iterations on the current closure.

    Both closures take ``(params_pytree, *args)`` so per-minibatch context (data, ADMM
    duals, loss weights) threads through without rebuilding the step."""

    lr = cfg.lr
    max_iter = cfg.max_iter
    max_eval = max_iter * 5 // 4
    lm0 = cfg.trust_region_lm0
    unroll = cfg.unroll_outer

    def step(x, state: LBFGSState, *args) -> LBFGSResult:
        value_and_grad_fn = lambda v: value_and_grad_fn_outer(v, *args)
        if cfg.cost_use_gradient:
            # reference parity: probes run with gradient machinery enabled
            # (src/lbfgsnew.py:686-693); the probe value is identical, only costlier
            value_fn = lambda v: value_and_grad_fn_outer(v, *args)[0]
        else:
            value_fn = lambda v: value_fn_outer(v, *args)
        fdtype = _dtype_of(x)
        loss0, g0 = value_and_grad_fn(x)
        state = state.replace(func_evals=state.func_evals + 1)
        abs_grad_sum0 = _tabs_sum(g0)
        grad_nrm = jnp.sqrt(_tdot(g0, g0))    # fixed at entry (reference :555)
        orig_loss = loss0

        def cond(carry):
            (x, g, loss, state, n_iter, current_evals, done) = carry
            return (~done) & (n_iter < max_iter) & (~jnp.isnan(grad_nrm))

        def body(carry, static_last=None):
            """One L-BFGS iteration.  ``static_last``: None inside the while-loop
            lowering (the re-eval skip is a traced ``lax.cond`` on n_iter); True/False
            under the unrolled lowering, where slot order makes it static — ``done`` is
            sticky, so whenever slot i is active its n_iter equals i+1 and the
            "announced last iteration" test ``n_iter != max_iter`` is known at trace
            time (slots 0..max_iter-2 re-evaluate, the last slot never does)."""
            (x, g, loss, state, n_iter, current_evals, done) = carry
            n_iter = n_iter + 1
            gi = state.n_iter + 1                      # global iteration count
            state = state.replace(n_iter=gi)

            first_global = gi == 1

            # ---- direction -----------------------------------------------------
            # No lax.cond carries any history-sized buffer: branch decisions are
            # always-compute + where selects.
            y = _tsub(g, state.prev_grad)
            s = _tscale(state.d, state.t)
            if cfg.batch_mode:
                y = _taxpy(y, lm0, s)                   # trust region (reference :586)
            ys = _tdot(y, s)
            sn2 = _tdot(s, s)
            batch_changed = (
                jnp.asarray(cfg.batch_mode, bool) & (n_iter == 1) & (gi > 1)
            )

            # online inter-batch gradient statistics (reference :592-607); on the very
            # first global iteration the running stats are zeros by construction
            g_old = _tsub(g, state.running_avg)
            running_avg_new = _taxpy(state.running_avg, 1.0 / gi.astype(fdtype), g_old)
            g_new_t = _tsub(g, running_avg_new)
            running_avg_sq_new = jax.tree.map(
                lambda acc, gn, go: acc + gn * go,
                state.running_avg_sq, g_new_t, g_old,
            )
            alphabar_new = 1.0 / (
                1.0
                + jax.tree.reduce(
                    operator.add, jax.tree.map(jnp.sum, running_avg_sq_new)
                )
                / (jnp.maximum(gi - 1, 1).astype(fdtype) * grad_nrm)
            )
            state = state.replace(
                running_avg=_tselect(batch_changed, running_avg_new, state.running_avg),
                running_avg_sq=_tselect(
                    batch_changed, running_avg_sq_new, state.running_avg_sq
                ),
                alphabar=jnp.where(batch_changed, alphabar_new, state.alphabar),
            )

            accept = (ys > 1e-10 * sn2) & (~batch_changed) & (~first_global)
            state = _push_history(state, s, y, accept)
            state = state.replace(
                H_diag=jnp.where(
                    accept,
                    ys / _tdot(y, y),
                    jnp.where(first_global, jnp.ones((), fdtype), state.H_diag),
                ),
                hist_count=jnp.where(first_global, 0, state.hist_count),
            )
            d_two = _two_loop(
                g, state.s_hist, state.y_hist, state.hist_ptr, state.hist_count,
                state.H_diag,
            )
            d = _tselect(first_global, _tscale(g, -1.0), d_two)
            state = state.replace(prev_grad=g, prev_loss=loss, d=d)

            # ---- step size -----------------------------------------------------
            t0 = jnp.where(
                first_global,
                jnp.minimum(1.0, 1.0 / abs_grad_sum0) * lr,
                jnp.asarray(lr, fdtype),
            )
            gtd = _tdot(g, d)

            if cfg.line_search:
                if cfg.batch_mode:
                    t, ls_evals = _linesearch_backtrack(
                        value_fn, x, d, g, state.alphabar, cfg, loss
                    )
                else:
                    t, ls_evals = _linesearch_cubic(
                        value_fn, x, d, cfg, lr, fdtype, loss
                    )
                t = jnp.where(jnp.isnan(t), jnp.asarray(lr, fdtype), t)
                state = state.replace(
                    func_evals=state.func_evals + jnp.asarray(ls_evals, jnp.int32)
                )
            else:
                t = t0

            x = _taxpy(x, t, d)
            state = state.replace(t=t)

            # ---- re-evaluate (except on the announced last iteration) ----------
            def reeval(_):
                l, gg = value_and_grad_fn(x)
                return l, gg, jnp.asarray(1, jnp.int32)

            def keep(_):
                return loss, g, jnp.asarray(0, jnp.int32)

            if static_last is None:
                loss_new, g_next, ev = jax.lax.cond(
                    n_iter != max_iter, reeval, keep, None
                )
            elif static_last:
                loss_new, g_next, ev = keep(None)
            else:
                loss_new, g_next, ev = reeval(None)
            current_evals = current_evals + ev
            state = state.replace(func_evals=state.func_evals + ev)
            abs_grad_sum = _tabs_sum(g_next)

            # ---- termination tests (reference :725-741) -------------------------
            done = (
                (n_iter == max_iter)
                | jnp.isnan(abs_grad_sum)
                | (current_evals >= max_eval)
                | (abs_grad_sum <= cfg.tolerance_grad)
                | (gtd > -cfg.tolerance_change)
                | (jnp.abs(t) * _tabs_sum(d) <= cfg.tolerance_change)
                | (jnp.abs(loss_new - state.prev_loss) < cfg.tolerance_change)
            )
            return (x, g_next, loss_new, state, n_iter, current_evals, done)

        init = (
            x, g0, loss0, state, jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
            abs_grad_sum0 <= cfg.tolerance_grad,
        )
        if unroll:
            # Straight-line lowering of the outer iteration with done-masking:
            # ``done`` is sticky, so slot i either IS iteration i+1 or a fully
            # discarded no-op.  The while-loop region boundary otherwise blocks XLA
            # from fusing/CSEing the re-eval value_and_grad forwards with their
            # neighbors (the same lowering pessimization measured 6.4x on the ADMM
            # scan — benchmarks/decompose.py, config.py::admm_unroll).
            carry = init
            for i in range(max_iter):
                active = cond(carry)
                new_carry = body(carry, static_last=(i == max_iter - 1))
                carry = jax.tree.map(
                    lambda n, o: jnp.where(active, n, o), new_carry, carry
                )
            x, g, loss, state, *_ = carry
        else:
            x, g, loss, state, *_ = jax.lax.while_loop(cond, body, init)
        return LBFGSResult(x=x, state=state, loss=orig_loss)

    return step


class LBFGS:
    """Convenience wrapper: holds params + state and runs the jitted step."""

    def __init__(self, loss_fn: Callable, params, cfg: LBFGSConfig):
        self.cfg = cfg
        vf = loss_fn
        vg = jax.value_and_grad(loss_fn)
        self._step = jax.jit(make_lbfgs_step(vg, vf, cfg))
        self.state = lbfgs_init(params, cfg)
        self._params = params

    @property
    def params(self):
        return self._params

    def step(self) -> float:
        res = self._step(self._params, self.state)
        self._params, self.state = res.x, res.state
        return float(res.loss)
