"""Adaptive Dormand–Prince 5(4) integration, fully on-device.

Parity target: torchdiffeq's ``Dopri5Solver`` / ``AdaptiveStepsizeODESolver``
(SURVEY.md §2 T3): FSAL stepping, RMS error control against
``atol + rtol·max(|y0|,|y1|)``, Hairer initial-step selection, the dopri5.f
PI step-size controller (safety 0.9, growth clamp 10×, shrink clamp 0.2×,
β=0.04), and 4th-order dense output so requested times are *interpolated*,
never stepped-to.

The reference drives accept/reject from host Python, syncing a scalar per
step (SURVEY.md §3.1 — its central inefficiency).  Here there are two
jittable realisations of the same math:

  * ``odeint_dopri5``      — ``lax.scan`` over requested times with an inner
    ``lax.while_loop`` per interval.  True data-dependent step count; the
    fast inference path (reverse-mode AD through ``while_loop`` is
    unsupported — train with the scan path or the adjoint).
  * ``odeint_dopri5_scan`` — a bounded ``lax.scan`` with accept/reject
    masking and steps clipped to land exactly on each output time.
    Reverse-differentiable (discretize-then-optimize); costs
    ``max_steps_per_interval`` evaluations per interval regardless of how
    many are needed.

Step sizes and accept decisions are computed under ``stop_gradient`` — the
controller is treated as a non-differentiable discrete choice, matching the
discretize-then-optimize convention.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from graph_odenet_tpu.ode.tableaus import DOPRI5, Tableau, rk_step

__all__ = ["odeint_adaptive", "odeint_adaptive_scan", "odeint_adaptive_ckpt",
           "odeint_dopri5", "odeint_dopri5_scan"]

# dopri5.f controller constants.
_SAFETY = 0.9
_BETA = 0.04
_EXPO1 = 0.2 - 0.75 * _BETA
_FAC_MIN = 0.2    # max shrink per step:   dt ← ≥ 0.2·dt
_FAC_MAX = 10.0   # max growth per step:   dt ← ≤ 10·dt
_ERR_FLOOR = 1e-10


def _rms(x):
    return jnp.sqrt(jnp.mean(jnp.square(x)))


def _error_ratio(y_err, y0, y1, rtol, atol):
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    return _rms(y_err / scale)


def _initial_step(func, t0, y0, f0, order, rtol, atol):
    """Hairer's starting-step heuristic (torchdiffeq ``_select_initial_step``)."""
    dtype = y0.dtype
    scale = atol + jnp.abs(y0) * rtol
    d0 = _rms(y0 / scale)
    d1 = _rms(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = y0 + h0 * f0
    f1 = func(t0 + h0, y1)
    d2 = _rms((f1 - f0) / scale) / h0
    h1 = jnp.where(
        jnp.maximum(d1, d2) <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / (order + 1)),
    )
    return jnp.minimum(100.0 * h0, h1).astype(dtype)


def _interp_fit(y0, y1, y_mid, f0, f1, dt):
    """Quartic through (y0, y_mid, y1) with end slopes (f0, f1).

    Coefficients ``[a, b, c, d, e]`` of ``p(x) = ((((a·x + b)·x + c)·x + d)·x
    + e)`` on the unit interval x ∈ [0, 1] (same fit torchdiffeq /
    jax.experimental.ode use for dopri5 dense output)."""
    a = 2.0 * dt * (f1 - f0) - 8.0 * (y1 + y0) + 16.0 * y_mid
    b = dt * (5.0 * f0 - 3.0 * f1) + 18.0 * y0 + 14.0 * y1 - 32.0 * y_mid
    c = dt * (f1 - 4.0 * f0) - 11.0 * y0 - 5.0 * y1 + 16.0 * y_mid
    d = dt * f0
    e = y0
    return jnp.stack([a, b, c, d, e])


def _interp_eval(coeffs, t0, t1, t):
    """Evaluate the dense-output quartic at t ∈ [t0, t1]."""
    span = t1 - t0
    x = jnp.where(span > 0, (t - t0) / jnp.where(span > 0, span, 1.0), 0.0)
    a, b, c, d, e = coeffs
    return ((((a * x + b) * x + c) * x + d) * x) + e


class _State(NamedTuple):
    i: jax.Array          # steps attempted in current interval
    t: jax.Array          # current (accepted) time
    y: jax.Array          # state at t
    f: jax.Array          # f(t, y)  (FSAL carry)
    dt: jax.Array         # proposed next step
    last_t: jax.Array     # start of the last accepted step
    coeffs: jax.Array     # [5, D] dense-output quartic over [last_t, t]
    facold: jax.Array     # PI-controller memory: max(last err, 1e-4)
    rejected: jax.Array   # bool — last attempt was rejected
    nfe: jax.Array        # total dynamics evaluations
    n_accept: jax.Array
    n_reject: jax.Array


def _controller(err, facold, rejected, dt):
    """dopri5.f PI step-size update.  Returns (accept, dt_next, facold')."""
    err = jnp.maximum(err, _ERR_FLOOR)
    accept = err <= 1.0
    fac11 = err ** _EXPO1
    fac = fac11 / (facold ** _BETA)
    fac = jnp.clip(fac / _SAFETY, 1.0 / _FAC_MAX, 1.0 / _FAC_MIN)
    dt_accept = dt / fac
    # After a rejection, never grow the step on the following accept.
    dt_accept = jnp.where(rejected, jnp.minimum(dt_accept, dt), dt_accept)
    dt_reject = dt / jnp.minimum(1.0 / _FAC_MIN, fac11 / _SAFETY)
    dt_next = jnp.where(accept, dt_accept, dt_reject)
    facold_next = jnp.where(accept, jnp.maximum(err, 1e-4), facold)
    return accept, dt_next, facold_next


def _nfe_per_step(tab: Tableau) -> int:
    # rk_step evaluates stages 1..S-1 (k0 is the FSAL carry) plus one
    # extra f(t+dt, y1) for non-FSAL tableaus.
    return len(tab.b) - 1 + (0 if tab.fsal else 1)


def _attempt_step(func, tab, rtol, atol, s: _State) -> _State:
    """One accept-or-reject RK attempt from s.t with step s.dt."""
    y1, f1, y_err, k = rk_step(func, tab, s.t, s.y, s.f, s.dt)
    err = jax.lax.stop_gradient(_error_ratio(y_err, s.y, y1, rtol, atol))
    accept, dt_next, facold = _controller(
        err, s.facold, s.rejected, jax.lax.stop_gradient(s.dt)
    )

    if tab.c_mid is not None:
        c_mid = jnp.asarray(tab.c_mid, dtype=s.y.dtype)
        y_mid = s.y + s.dt * jnp.tensordot(c_mid, k, axes=1)
    else:
        # Cubic-Hermite midpoint — enough dense-output accuracy for
        # order ≤ 3 tableaus without published c_mid weights.
        y_mid = 0.5 * (s.y + y1) + s.dt * (s.f - f1) / 8.0
    new_coeffs = _interp_fit(s.y, y1, y_mid, s.f, f1, s.dt)

    sel = lambda a, b: jnp.where(accept, a, b)
    return _State(
        i=s.i + 1,
        t=sel(s.t + s.dt, s.t),
        y=sel(y1, s.y),
        f=sel(f1, s.f),
        dt=dt_next,
        last_t=sel(s.t, s.last_t),
        coeffs=sel(new_coeffs, s.coeffs),
        facold=facold,
        rejected=jnp.logical_not(accept),
        nfe=s.nfe + _nfe_per_step(tab),
        n_accept=s.n_accept + accept.astype(jnp.int32),
        n_reject=s.n_reject + (1 - accept.astype(jnp.int32)),
    )


def _init_state(func, y0, t0, tab, rtol, atol, first_step) -> _State:
    dtype = y0.dtype
    f0 = func(t0, y0)
    if first_step is None:
        dt0 = _initial_step(func, t0, y0, f0, tab.order - 1, rtol, atol)
        nfe0 = jnp.asarray(3, jnp.int32)  # f0 + the two probe evals
    else:
        dt0 = jnp.asarray(first_step, dtype)
        nfe0 = jnp.asarray(1, jnp.int32)
    return _State(
        i=jnp.asarray(0, jnp.int32),
        t=t0,
        y=y0,
        f=f0,
        dt=dt0,
        last_t=t0,
        coeffs=_interp_fit(y0, y0, y0, f0 * 0, f0 * 0, jnp.asarray(0, dtype)),
        facold=jnp.asarray(1e-4, dtype),
        rejected=jnp.asarray(False),
        nfe=nfe0,
        n_accept=jnp.asarray(0, jnp.int32),
        n_reject=jnp.asarray(0, jnp.int32),
    )


def odeint_adaptive(
    func: Callable,
    y0: jax.Array,
    ts: jax.Array,
    *,
    tab: Tableau = DOPRI5,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    max_steps: int = 10_000,
    first_step: float | None = None,
):
    """Adaptive integration with true data-dependent step count.

    Args / returns as ``fixed.odeint_fixed``; additionally returns a stats
    dict ``{nfe, n_accept, n_reject}``.  ``ts`` must be strictly increasing
    (the api layer handles reversal).
    """
    dtype = y0.dtype
    ts = ts.astype(dtype)
    init = _init_state(func, y0, ts[0], tab, rtol, atol, first_step)

    def per_target(state: _State, t_target):
        def cond(s):
            return (s.t < t_target) & (s.i < max_steps)

        def body(s):
            return _attempt_step(func, tab, rtol, atol, s)

        s = jax.lax.while_loop(cond, body, state._replace(i=jnp.asarray(0, jnp.int32)))
        y_t = _interp_eval(s.coeffs, s.last_t, s.t, t_target)
        return s, (y_t, s.t >= t_target)

    final, (ys_tail, reached) = jax.lax.scan(per_target, init, ts[1:])
    ys = jnp.concatenate([y0[None], ys_tail], axis=0)
    # Honesty flags (torchdiffeq raises on step exhaustion; under jit we
    # report instead): success=False means some interval hit ``max_steps``
    # before reaching its target time and the corresponding ys rows are
    # extrapolated from the last accepted step — do not trust them.
    stats = dict(
        nfe=final.nfe, n_accept=final.n_accept, n_reject=final.n_reject,
        success=jnp.all(reached), t_reached=final.t,
    )
    return ys, stats


def odeint_adaptive_scan(
    func: Callable,
    y0: jax.Array,
    ts: jax.Array,
    *,
    tab: Tableau = DOPRI5,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    max_steps_per_interval: int = 64,
    first_step: float | None = None,
):
    """Reverse-differentiable adaptive integration (bounded scan + masking).

    Controller-identical to ``odeint_adaptive``: the same
    ``_attempt_step`` (natural step sizes, never clipped to output times)
    with outputs *interpolated* from the dense-output quartic — each output
    interval just runs a fixed ``max_steps_per_interval`` attempts with
    finished intervals passing state through unchanged, so given a
    sufficient step budget the trajectory, step sequence, and NFE match the
    ``lax.while_loop`` solver exactly (pinned by
    ``tests/test_ode.py::test_scan_matches_while``).
    """
    dtype = y0.dtype
    ts = ts.astype(dtype)
    init = _init_state(func, y0, ts[0], tab, rtol, atol, first_step)

    def per_target(state: _State, t_target):
        def step(s, _):
            done = s.t >= t_target
            s1 = _attempt_step(func, tab, rtol, atol, s)
            s_next = jax.tree_util.tree_map(
                lambda a, b: jnp.where(done, a, b), s, s1
            )
            return s_next, None

        s, _ = jax.lax.scan(
            step, state._replace(i=jnp.asarray(0, jnp.int32)), None,
            length=max_steps_per_interval,
        )
        y_t = _interp_eval(s.coeffs, s.last_t, s.t, t_target)
        return s, (y_t, s.t >= t_target)

    final, (ys_tail, reached) = jax.lax.scan(per_target, init, ts[1:])
    ys = jnp.concatenate([y0[None], ys_tail], axis=0)
    # success=False: an interval ran out of ``max_steps_per_interval``
    # attempts before reaching its target time (ys row extrapolated).
    stats = dict(
        nfe=final.nfe, n_accept=final.n_accept, n_reject=final.n_reject,
        success=jnp.all(reached), t_reached=final.t,
    )
    return ys, stats


def odeint_adaptive_ckpt(
    func: Callable,
    y0: jax.Array,
    ts: jax.Array,
    *,
    tab: Tableau = DOPRI5,
    rtol: float = 1e-7,
    atol: float = 1e-9,
    trace_per_interval: int = 32,
    first_step: float | None = None,
):
    """Adaptive integration that records the accepted-step trajectory.

    The forward path of the checkpointed adjoint (VERDICT r4 #3): a true
    ``lax.while_loop`` per output interval (real step count, no masked
    scan waste) whose final step per interval is CLIPPED to land exactly
    on the output time — so output times are step boundaries and the
    reverse sweep can inject cotangents there without differentiating the
    dense-output interpolation.  Every accepted ``(t, y)`` is written into
    fixed ``trace_per_interval·(T−1)``-slot buffers (one extra trash slot
    absorbs rejected attempts and overflow).

    Returns ``(ys, stats, trace)`` with ``trace = {t[K+2], y[K+2, D],
    acc_at_target[T], n_steps, ok}``; ``acc_at_target[i]`` is the number of
    accepted steps when output time i was reached (global indices into the
    trace buffers).  ``ok=False`` (also folded into ``stats["success"]``)
    means the budget overflowed and the trace is unusable for gradients.
    """
    dtype = y0.dtype
    ts = ts.astype(dtype)
    n_targets = ts.shape[0] - 1
    K = trace_per_interval * n_targets
    init = _init_state(func, y0, ts[0], tab, rtol, atol, first_step)
    # Unwritten slots keep t = ts[0] so a masked/overflowed reverse step
    # sees dt == 0 rather than garbage.
    tbuf = jnp.full((K + 2,), ts[0], dtype)
    ybuf = jnp.zeros((K + 2, y0.shape[0]), dtype).at[0].set(y0)
    max_attempts = 2 * trace_per_interval + 10

    def per_target(carry, t_target):
        def cond(c):
            s, _, _ = c
            return (s.t < t_target) & (s.i < max_attempts)

        def body(c):
            s, tbuf, ybuf = c
            remaining = t_target - s.t
            clipped = s.dt >= remaining
            s1 = _attempt_step(
                func, tab, rtol, atol,
                s._replace(dt=jnp.minimum(s.dt, remaining)),
            )
            accepted = jnp.logical_not(s1.rejected)
            land = accepted & clipped
            s1 = s1._replace(
                # Exact landing (s.t + (t_target − s.t) need not round-trip
                # in f32; an ulp short would spin the loop on micro-steps).
                t=jnp.where(land, t_target, s1.t),
                # A clipped step shrinks the controller's proposal purely
                # because the interval ended — carry the pre-clip proposal
                # into the next interval instead.
                dt=jnp.where(land, jnp.maximum(s1.dt, s.dt), s1.dt),
            )
            idx = jnp.where(accepted, jnp.minimum(s1.n_accept, K + 1), K + 1)
            return (s1, tbuf.at[idx].set(s1.t), ybuf.at[idx].set(s1.y))

        s, tb, yb = c = jax.lax.while_loop(
            cond, body, (carry[0]._replace(i=jnp.asarray(0, jnp.int32)),)
            + carry[1:],
        )
        return c, (s.y, s.t >= t_target, s.n_accept)

    (final, tbuf, ybuf), (ys_tail, reached, acc_at) = jax.lax.scan(
        per_target, (init, tbuf, ybuf), ts[1:]
    )
    ys = jnp.concatenate([y0[None], ys_tail], axis=0)
    acc_at_target = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), acc_at.astype(jnp.int32)]
    )
    ok = final.n_accept <= K
    stats = dict(
        nfe=final.nfe, n_accept=final.n_accept, n_reject=final.n_reject,
        success=jnp.all(reached) & ok, t_reached=final.t,
    )
    trace = dict(
        t=tbuf, y=ybuf, acc_at_target=acc_at_target,
        n_steps=final.n_accept, ok=ok,
    )
    return ys, stats, trace


def odeint_dopri5(func, y0, ts, **kw):
    """Backwards-compatible alias: ``odeint_adaptive`` with DOPRI5."""
    return odeint_adaptive(func, y0, ts, tab=DOPRI5, **kw)


def odeint_dopri5_scan(func, y0, ts, **kw):
    """Backwards-compatible alias: ``odeint_adaptive_scan`` with DOPRI5."""
    return odeint_adaptive_scan(func, y0, ts, tab=DOPRI5, **kw)
