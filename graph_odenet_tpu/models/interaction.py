"""Interaction Networks (Battaglia et al. 2016) — discrete and ODE form.

Parity: reference ``InteractionNetwork`` / ``RelationModel`` / ``ObjectModel``
(SURVEY.md §2 R9) and the IN-ODE wrapper (R10).  The reference marshals
object states through dense one-hot incidence matmuls ``O·R_s`` / ``O·R_r``;
for the small fully-connected n-body graphs both that and a gather are
memory-trivial — we use gather + ``segment_sum`` so the exact same code
scales to large sparse relation sets, and ``vmap`` supplies the batch
dimension the reference gets from torch broadcasting.

Defaults follow the published IN sizes the reference uses (SURVEY.md R9):
relation MLP 4×150 → 50-dim effects, object MLP 100 hidden.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from graph_odenet_tpu.ode import odeint, odeint_adjoint
from graph_odenet_tpu.ops.segment import gather, segment_sum


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int
    activation: str = "relu"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        for h in self.hidden:
            x = act(nn.Dense(h, dtype=self.dtype, param_dtype=self.param_dtype)(x))
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=self.param_dtype)(x)


class InteractionNetwork(nn.Module):
    """effects = φ_R([o_src ‖ o_dst ‖ r_attr]);  out = φ_O([o ‖ Σ effects ‖ ext]).

    ``__call__(objs[N,Do], senders[E], receivers[E], rel_attr[E,Dr]?,
    ext[N,De]?) -> [N, out_dim]``.  Batch with ``jax.vmap`` over leading
    axes of ``objs``/``rel_attr``/``ext``.
    """

    out_dim: int
    effect_dim: int = 50
    relation_hidden: Sequence[int] = (150, 150, 150, 150)
    object_hidden: Sequence[int] = (100,)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, objs, senders, receivers, rel_attr=None, ext=None):
        n = objs.shape[0]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rel_in = [gather(objs, senders), gather(objs, receivers)]
        if rel_attr is not None:
            rel_in.append(rel_attr)
        effects = MLP(self.relation_hidden, self.effect_dim, **kw)(
            jnp.concatenate(rel_in, axis=-1)
        )
        agg = segment_sum(effects, receivers, num_segments=n, sorted_ids=False)
        obj_in = [objs, agg]
        if ext is not None:
            obj_in.append(ext)
        return MLP(self.object_hidden, self.out_dim, **kw)(
            jnp.concatenate(obj_in, axis=-1)
        )


class INODE(nn.Module):
    """Interaction network as continuous dynamics (SURVEY.md §2 R10).

    State ``y = [N, 2D]`` is position ‖ velocity; the IN predicts
    acceleration from ``[static_attr ‖ pos ‖ vel]`` so the vector field is

        d pos/dt = vel,   d vel/dt = IN(...)

    ``__call__(y0, ts, static_attr[N,Ds], senders, receivers)`` integrates
    over ``ts`` and returns the trajectory ``[T, N, 2D]`` — the reference's
    long-span ``odeint(IN_func, state_0, t_grid)`` rollout (§3.4).
    """

    dim: int = 2
    effect_dim: int = 50
    relation_hidden: Sequence[int] = (150, 150, 150, 150)
    object_hidden: Sequence[int] = (100,)
    method: str = "dopri5_scan"
    rtol: float = 1e-4
    atol: float = 1e-6
    steps: int = 16
    adjoint: Union[bool, str] = False  # False | True | "checkpoint"
    remat: bool = False         # rematerialise dynamics on backward — the
                                # TPU HBM lever: without it the solver scan
                                # stores every relation-MLP activation per
                                # step (OOMs at batch 512 on a 16 GB chip)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y0, ts, static_attr, senders, receivers, rel_attr=None):
        core = InteractionNetwork(
            out_dim=self.dim,
            effect_dim=self.effect_dim,
            relation_hidden=self.relation_hidden,
            object_hidden=self.object_hidden,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        D = self.dim

        def dynamics(t, y, params):
            del t
            pos, vel = y[..., :D], y[..., D:]
            objs = jnp.concatenate([static_attr, pos, vel], axis=-1)
            accel = core.apply(
                {"params": params}, objs, senders, receivers, rel_attr
            )
            return jnp.concatenate([vel, accel], axis=-1)

        params = self.param(
            "core",
            lambda rng: core.init(
                rng,
                jnp.concatenate([static_attr, y0], axis=-1),
                senders,
                receivers,
                rel_attr,
            )["params"],
        )
        if self.remat:
            dynamics = jax.checkpoint(dynamics)
        integ = odeint_adjoint if self.adjoint else odeint
        kw = (
            dict(checkpoint=True) if self.adjoint == "checkpoint" else {}
        )
        return integ(
            dynamics, y0, ts, params,
            method=self.method, rtol=self.rtol, atol=self.atol,
            steps_per_interval=self.steps, max_steps_per_interval=self.steps,
            **kw,
        )
