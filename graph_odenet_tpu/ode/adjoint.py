"""Continuous adjoint — O(1)-memory gradients through ``odeint``.

Parity target: torchdiffeq's ``OdeintAdjointMethod`` (SURVEY.md §2 T4,
§3.5): the backward pass never stores the forward trajectory between
requested times; instead it re-integrates the augmented system

    d/dt [ y, a, ĝ_t, ĝ_args ] = [ f,  −aᵀ∂f/∂y,  −aᵀ∂f/∂t,  −aᵀ∂f/∂args ]

in reverse, seeded at each requested time with the incoming cotangent.
Reverse time is handled with the substitution s = −t (our solvers integrate
increasing grids only), under which every augmented component simply flips
sign via the vjp of ``f`` evaluated at −s.

Implemented as ``jax.custom_vjp`` so it composes with jit / scan / pjit and
works for *any* forward method, including the non-differentiable
``lax.while_loop`` dopri5.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["_odeint_adjoint_impl"]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _odeint_adjoint_impl(func, opts, y0, ts, *args):
    from graph_odenet_tpu.ode.api import odeint

    # Always request stats: the forward solve inside the custom_vjp is the
    # only place they exist, and hiding them forced consumers (ODEBlock,
    # ode_model_bench) to probe NFE through a non-adjoint twin.  They ride
    # along as a primal output (integer leaves → float0 cotangents).
    kw = dict(opts)
    kw["return_stats"] = True
    return odeint(func, y0, ts, *args, **kw)


def _fwd(func, opts, y0, ts, *args):
    ys, stats = _odeint_adjoint_impl(func, opts, y0, ts, *args)
    return (ys, stats), (ys, ts, args)


def _bwd(func, opts, residuals, g):
    from graph_odenet_tpu.ode.api import odeint

    ys, ts, args = residuals
    g = g[0]  # cotangent of ys; the stats cotangent is symbolic-zero
    kw = dict(opts)
    # Backward integration reuses the forward solver settings; the
    # while-loop dopri5 is fine here (the adjoint IS the gradient path).
    bwd_kw = dict(kw)
    bwd_kw["return_stats"] = False

    def aug_dynamics(s, aug, *args):
        """Augmented dynamics in reversed time s = −t."""
        y, y_bar, _, _ = aug
        f_eval, vjp_fn = jax.vjp(lambda y_, t_, *a_: func(t_, y_, *a_), y, -s, *args)
        vy, vt, *vargs = vjp_fn(y_bar)
        # d/ds flips the sign of dy/dt; the adjoint components get −(−aᵀ∂f/∂·).
        return (
            jax.tree_util.tree_map(jnp.negative, f_eval),
            vy,
            vt,
            tuple(vargs),
        )

    def y_at(i):
        return jax.tree_util.tree_map(lambda a: a[i], ys)

    def g_at(i):
        return jax.tree_util.tree_map(lambda a: a[i], g)

    T = ts.shape[0]
    zeros_args = jax.tree_util.tree_map(jnp.zeros_like, args)

    def scan_fun(carry, i):
        y_bar, t0_bar, args_bar = carry
        yi, gi = y_at(i), g_at(i)
        # Effect of perturbing the i-th measurement time.
        f_i = func(ts[i], yi, *args)
        t_bar = sum(
            jnp.vdot(fl, gl)
            for fl, gl in zip(jax.tree_util.tree_leaves(f_i), jax.tree_util.tree_leaves(gi))
        )
        t0_bar = t0_bar - t_bar
        aug0 = (yi, y_bar, t0_bar, args_bar)
        span = jnp.stack([-ts[i], -ts[i - 1]])
        aug_path = odeint(aug_dynamics, aug0, span, *args, **bwd_kw)
        _, y_bar, t0_bar, args_bar = jax.tree_util.tree_map(
            lambda a: a[1], aug_path
        )
        y_bar = jax.tree_util.tree_map(jnp.add, y_bar, g_at(i - 1))
        return (y_bar, t0_bar, args_bar), t_bar

    init = (g_at(T - 1), jnp.zeros_like(ts[0]), zeros_args)
    (y0_bar, t0_bar, args_bar), rev_ts_bar = jax.lax.scan(
        scan_fun, init, jnp.arange(T - 1, 0, -1)
    )
    ts_bar = jnp.concatenate([t0_bar[None], rev_ts_bar[::-1]])
    return (y0_bar, ts_bar, *args_bar)


_odeint_adjoint_impl.defvjp(_fwd, _bwd)
