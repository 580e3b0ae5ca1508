"""Fixed-grid Adams multistep integration (torchdiffeq's ``explicit_adams``
/ ``implicit_adams``, SURVEY.md §2 T2).

Adams–Bashforth 4 (explicit) and Adams–Bashforth–Moulton 4 in PECE form
(predict with AB4, evaluate, correct with the 3-step Adams–Moulton, evaluate
for the history).  Multistep methods reuse the dynamics-evaluation history,
so per step they cost 1 eval (AB4) or 2 evals (ABM4) instead of RK4's 4 —
the classic trade when ``func`` dominates (here: one SpMM+matmul per eval).

History requires a uniform step, so each requested output interval runs its
own uniform sub-grid with an RK4 warmup for the first ``order−1`` substeps
(RK4's O(dt⁵) local error keeps the global order at 4, unlike low-order
startup).  The whole trajectory is one ``lax.scan`` — on device and
reverse-differentiable, like the other fixed-grid solvers.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from graph_odenet_tpu.ode.tableaus import RK4, rk_step

__all__ = ["odeint_adams"]

# Adams–Bashforth weights on [f_n, f_{n−1}, f_{n−2}, f_{n−3}].
_AB4 = (55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0)
# 3-step Adams–Moulton weights on [f_{n+1}, f_n, f_{n−1}, f_{n−2}].
_AM4 = (9.0 / 24.0, 19.0 / 24.0, -5.0 / 24.0, 1.0 / 24.0)
_ORDER = 4


def odeint_adams(
    func: Callable,
    y0: jax.Array,
    ts: jax.Array,
    *,
    steps_per_interval: int = 4,
    corrector: bool = False,
):
    """Integrate ``dy/dt = func(t, y)`` over ``ts`` with AB4 / ABM4.

    Args as ``fixed.odeint_fixed``; ``corrector=True`` adds the
    Adams–Moulton PECE correction (torchdiffeq's ``implicit_adams``).

    Returns ``(ys: f32[T, D], nfe: i32[])``.
    """
    n_sub = int(steps_per_interval)
    dtype = y0.dtype

    def substep(carry, i):
        t, y, hist, dt, nfe = carry
        f_now = func(t, y)
        hist = jnp.roll(hist, 1, axis=0).at[0].set(f_now)

        def warmup(_):
            y1, _, _, _ = rk_step(func, RK4, t, y, f_now, dt, compute_f1=False)
            return y1, nfe + 4

        def adams(_):
            coeff = jnp.asarray(_AB4, dtype)
            y_pred = y + dt * jnp.tensordot(coeff, hist, axes=1)
            if not corrector:
                return y_pred, nfe + 1
            f_pred = func(t + dt, y_pred)
            am = jnp.asarray(_AM4, dtype)
            y1 = y + dt * (
                am[0] * f_pred
                + am[1] * hist[0] + am[2] * hist[1] + am[3] * hist[2]
            )
            return y1, nfe + 2

        y1, nfe = jax.lax.cond(i < _ORDER - 1, warmup, adams, None)
        return (t + dt, y1, hist, dt, nfe), None

    def interval(carry, t_pair):
        y, nfe = carry
        t0, t1 = t_pair
        dt = (t1 - t0) / n_sub
        hist0 = jnp.zeros((_ORDER,) + y.shape, dtype)
        (_, y1, _, _, nfe), _ = jax.lax.scan(
            substep, (t0, y, hist0, dt, nfe), jnp.arange(n_sub)
        )
        return (y1, nfe), y1

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
    (_, nfe), ys_tail = jax.lax.scan(
        interval, (y0, jnp.asarray(0, jnp.int32)), t_pairs
    )
    ys = jnp.concatenate([y0[None], ys_tail], axis=0)
    return ys, nfe
