"""Fixed-grid ODE integration via ``lax.scan``.

Parity target: torchdiffeq's ``FixedGridODESolver`` (SURVEY.md §2 T2) —
euler / midpoint / rk4 stepping between consecutive requested time points.
The reference steps in host Python; here the whole trajectory is one
``lax.scan``, so it stays on device, is reverse-differentiable out of the
box (discretize-then-optimize), and composes with ``vmap`` / ``pjit``.

``steps_per_interval`` subdivides each output interval into equal substeps —
the analogue of torchdiffeq's ``options={'step_size': ...}`` grid
constructor, but shape-static.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from graph_odenet_tpu.ode.tableaus import Tableau, rk_step

__all__ = ["odeint_fixed"]


def odeint_fixed(
    func: Callable,
    tab: Tableau,
    y0: jax.Array,
    ts: jax.Array,
    *,
    steps_per_interval: int = 1,
):
    """Integrate ``dy/dt = func(t, y)`` over the grid ``ts``.

    Args:
      func: ``(t: f32[], y: f32[D]) -> f32[D]`` ravelled dynamics.
      y0:   ``f32[D]`` initial state at ``ts[0]``.
      ts:   ``f32[T]`` requested (strictly monotonic) output times.

    Returns:
      ``(ys: f32[T, D], nfe: i32[])`` — solution at every requested time
      (``ys[0] = y0``) and the number of dynamics evaluations.
    """
    n_sub = int(steps_per_interval)
    evals_per_step = len(tab.b)

    def substep(carry, _):
        t, y, dt = carry
        f0 = func(t, y)
        y1, _, _, _ = rk_step(func, tab, t, y, f0, dt, compute_f1=False)
        return (t + dt, y1, dt), None

    def interval(y, t_pair):
        t0, t1 = t_pair
        dt = (t1 - t0) / n_sub
        (_, y1, _), _ = jax.lax.scan(substep, (t0, y, dt), None, length=n_sub)
        return y1, y1

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
    _, ys_tail = jax.lax.scan(interval, y0, t_pairs)
    ys = jnp.concatenate([y0[None], ys_tail], axis=0)
    # FSAL tableaus re-evaluate nothing extra here; count = stages × steps.
    n_stage_evals = evals_per_step if not tab.fsal else evals_per_step - 1
    nfe = jnp.asarray((ts.shape[0] - 1) * n_sub * n_stage_evals, dtype=jnp.int32)
    return ys, nfe
