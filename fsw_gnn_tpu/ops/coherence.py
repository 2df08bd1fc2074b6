"""Mutual-coherence minimization of projection-vector frames, in pure JAX.

Reimplements the reference optimizer (/root/reference/fsw_embedding.py:
3045-3248): a p-norm surrogate schedule (p = 3 ... 1e13) of projected
gradient descent with adaptive step-size search, minimizing the maximum
off-diagonal Gram entry (mutual coherence) of a set of unit vectors.

The reference runs this eagerly with Python control flow; here each p-stage
is a single `lax.while_loop` whose carry encodes the reference's control
state (step-size init seek, backtracking, low-improvement strikes), so the
whole minimizer is jittable and runs on device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

P_SCHEDULE = (3., 6., 10., 20., 50., 100., 200., 500., 1000., 2000., 5000.,
              1e4, 2e4, 5e4, 1e5, 1e6, 1e7, 1e8, 1e9, 1e10, 1e11, 1e12, 1e13)

_STEP_INIT = 2000.0
_N_ITER_MAX = 1000
_IMPROVEMENT_THRESH = 1e-4
_STEP_MIN = 1e-5
_STEP_MAX = 1e10
_MAX_LOW_IMPROVEMENTS = 5
_STEP_DECREASE = 0.5


def _normalize_rows(X):
    return X / jnp.linalg.norm(X, axis=1, keepdims=True)


def gram_offdiag(X):
    """Gram matrix with zeroed diagonal (calc_G, fsw_embedding.py:3231-3235)."""
    G = X @ X.T
    return G - jnp.diag(jnp.diag(G))


def mutual_coherence(X):
    """Max |off-diagonal Gram entry| of the row frame X."""
    return jnp.max(jnp.abs(gram_offdiag(_normalize_rows(X))))


def _eval_G(G, p, n):
    """(mu, objective) -- eval_G, fsw_embedding.py:3242-3248."""
    mu = jnp.max(jnp.abs(G))
    rho = 1.0 / (2.0 * n * (n - 1.0))
    obj = mu * jnp.power(rho * jnp.sum(jnp.power(jnp.abs(G / mu), p)), 1.0 / p)
    return mu, obj


def _minimize_p(X_init, p, step_size_init):
    """One p-stage (minimize_mutual_coherence_p, fsw_embedding.py:3071-3228).

    `p` may be a traced scalar: every use is a jnp.power/abs, so one
    compiled stage serves the whole p-schedule (the reference compiles --
    well, interprets -- each stage separately)."""
    n = X_init.shape[0]
    dt = X_init.dtype
    rho = jnp.power(1.0 / (2.0 * n * (n - 1.0)), 1.0 / p).astype(dt)

    G0 = gram_offdiag(X_init)
    mu0, obj0 = _eval_G(G0, p, n)

    state = dict(
        X=X_init, G=G0, mu=mu0, obj=obj0,
        step=jnp.asarray(step_size_init, dt),
        low_cnt=jnp.zeros((), jnp.int32),
        finished_init=jnp.zeros((), bool),
        step_init_best=jnp.asarray(step_size_init, dt),
        obj_best_seek=jnp.asarray(jnp.inf, dt),
        Xb=X_init, Gb=G0, objb=obj0, mub=mu0,
        i=jnp.ones((), jnp.int32),
        done=jnp.zeros((), bool),
    )

    def cond(s):
        return jnp.logical_and(s['i'] <= _N_ITER_MAX, ~s['done'])

    def body(s):
        X, G, mu, obj, step = s['X'], s['G'], s['mu'], s['obj'], s['step']
        # gradient of the p-norm surrogate at the current (normalized) frame
        Gn = G / mu
        son = jnp.sum(jnp.power(jnp.abs(Gn), p))
        grad = rho / jnp.power(son, 1.0 - 1.0 / p) * (
            (jnp.power(jnp.abs(Gn), p - 1.0) * jnp.sign(Gn)) @ X
            - (jnp.power(jnp.abs(Gn), p) @ (mu * jnp.ones((X.shape[0], 1), dt))) * X)

        X_new = _normalize_rows(X - step * grad)
        G_new = gram_offdiag(X_new)
        mu_new, obj_new = _eval_G(G_new, p, n)

        improved = obj_new < obj
        fin = s['finished_init']

        # --- not improved ---
        can_decrease = step * _STEP_DECREASE >= _STEP_MIN
        # finished: shrink step (or stop at minimum); seeking: settle on best
        step_ni = jnp.where(fin,
                            jnp.where(can_decrease, step * _STEP_DECREASE, step),
                            s['step_init_best'])
        done_ni = jnp.where(fin, ~can_decrease, False)
        fin_ni = jnp.ones((), bool)

        # --- improved, still seeking the initial step size ---
        grow = jnp.logical_and(obj_new < s['obj_best_seek'],
                               step / _STEP_DECREASE <= _STEP_MAX)
        # grow: record best, try a larger step, stash backup, do not accept yet
        # stop-seek: settle on best step and backtrack to the stashed solution
        seek_step = jnp.where(grow, step / _STEP_DECREASE, s['step_init_best'])
        seek_obj_best = jnp.where(grow, obj_new, s['obj_best_seek'])
        seek_step_best = jnp.where(grow, step, s['step_init_best'])

        # candidate actually accepted this iteration?
        accept = jnp.logical_and(improved, jnp.logical_or(fin, ~grow))
        # solution to accept: backtrack to backup when ending the seek phase
        use_backup = jnp.logical_and(improved, jnp.logical_and(~fin, ~grow))
        Xa = jnp.where(use_backup, s['Xb'], X_new)
        Ga = jnp.where(use_backup, s['Gb'], G_new)
        obja = jnp.where(use_backup, s['objb'], obj_new)
        mua = jnp.where(use_backup, s['mub'], mu_new)

        improvement = (obj - obja) / (1.0 - obj)
        low = improvement <= _IMPROVEMENT_THRESH
        low_cnt_a = jnp.where(low, s['low_cnt'] + 1, 0)
        done_a = low_cnt_a >= _MAX_LOW_IMPROVEMENTS

        new = {}
        new['X'] = jnp.where(accept, Xa, X)
        new['G'] = jnp.where(accept, Ga, G)
        new['mu'] = jnp.where(accept, mua, mu)
        new['obj'] = jnp.where(accept, obja, obj)
        new['step'] = jnp.where(improved,
                                jnp.where(fin, step, seek_step),
                                step_ni)
        new['low_cnt'] = jnp.where(accept, low_cnt_a, s['low_cnt'])
        new['finished_init'] = jnp.where(
            improved,
            jnp.where(grow, fin, jnp.ones((), bool)),
            jnp.where(fin, fin, fin_ni))
        new['step_init_best'] = jnp.where(
            jnp.logical_and(improved, ~fin), seek_step_best, s['step_init_best'])
        new['obj_best_seek'] = jnp.where(
            jnp.logical_and(improved, ~fin), seek_obj_best, s['obj_best_seek'])
        stash = jnp.logical_and(improved, jnp.logical_and(~fin, grow))
        new['Xb'] = jnp.where(stash, X_new, s['Xb'])
        new['Gb'] = jnp.where(stash, G_new, s['Gb'])
        new['objb'] = jnp.where(stash, obj_new, s['objb'])
        new['mub'] = jnp.where(stash, mu_new, s['mub'])
        new['i'] = s['i'] + 1
        # stop flags: low-improvement strikes only when a solution is accepted;
        # step-at-minimum only on a non-improving iteration
        new['done'] = jnp.where(accept, done_a,
                                jnp.where(improved, False, done_ni))
        return new

    out = jax.lax.while_loop(cond, body, state)

    # revert the whole stage if coherence did not improve (py:3219-3226)
    keep = out['mu'] < mu0
    X_out = jnp.where(keep, out['X'], X_init)
    step_out = jnp.where(keep, out['step'], jnp.asarray(step_size_init, dt))
    return X_out, step_out


def minimize_mutual_coherence(X_init: jax.Array) -> jax.Array:
    """Minimize the mutual coherence of the rows of X_init (unit-normalized).

    Jittable; mirrors minimize_mutual_coherence (fsw_embedding.py:3045-3068).
    The p-schedule runs inside ONE lax.fori_loop (p traced), so the whole
    optimizer compiles once instead of once per p value.
    """
    n = X_init.shape[0]
    if X_init.size == 0:
        return X_init
    if n == 1:
        return _normalize_rows(X_init)
    X0 = _normalize_rows(X_init)
    p_vals = jnp.asarray(P_SCHEDULE, X0.dtype)

    def stage(i, carry):
        X, step = carry
        return _minimize_p(X, p_vals[i], step)

    X, _ = jax.lax.fori_loop(
        0, len(P_SCHEDULE), stage,
        (X0, jnp.asarray(_STEP_INIT, X0.dtype)))
    return X
