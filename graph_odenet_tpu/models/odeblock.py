"""ODE-wrapped GNNs — continuous-depth models (SURVEY.md §2 R6).

Parity: the reference wraps a GNN layer as autonomous dynamics
(``ODEFunc.forward(t, h) = gnn_layer(h, adj)`` with the adjacency captured
as module state) and integrates it with ``odeint`` over t ∈ [0, 1]
(``ODEBlock``).  Here the adjacency is a closure argument, the dynamics'
parameters are lifted into the enclosing module with ``self.param`` (so the
whole model is one parameter pytree), and the integrator is the jittable
``ode.odeint`` / ``ode.odeint_adjoint``.

NFE (number of function evaluations — the reference keeps a counter
attribute on its func) is sowed into the ``intermediates`` collection as
``ode_stats`` when available.
"""

from __future__ import annotations

from typing import Any, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from graph_odenet_tpu.graph import Graph
from graph_odenet_tpu.models.gat import GATLayer
from graph_odenet_tpu.models.gcn import GCNLayer
from graph_odenet_tpu.ode import odeint, odeint_adjoint

Adj = Union[Graph, jax.Array]


class GCNDynamics(nn.Module):
    """dh/dt = σ(Â h W + b) — width-preserving graph-conv vector field."""

    hidden: int
    activation: str = "tanh"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t, adj: Adj, h: jax.Array) -> jax.Array:
        del t  # autonomous, like the reference ODEFunc
        out = GCNLayer(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype)(
            adj, h
        )
        return getattr(nn, self.activation)(out)


class GATDynamics(nn.Module):
    """dh/dt = σ(att(h)) — width-preserving single-head attention field."""

    hidden: int
    activation: str = "tanh"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t, g: Graph, h: jax.Array) -> jax.Array:
        del t
        out = GATLayer(
            self.hidden,
            heads=1,
            concat=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(g, h)
        return getattr(nn, self.activation)(out)


class ODEBlock(nn.Module):
    """h(t1) = h(0) + ∫ f_θ(t, h) dt — continuous residual block.

    ``dynamics`` is any linen module with signature ``(t, adj, h) -> dh``.
    ``adjoint=True`` trains with the O(1)-memory continuous adjoint;
    ``adjoint="checkpoint"`` with the checkpointed-forward adjoint (stores
    accepted-step states, fixed-step anchored reverse sweep — the fast
    at-scale training path); otherwise pick a reverse-differentiable
    ``method`` (fixed-grid or ``dopri5_scan``) for discretize-then-optimize
    training.
    """

    dynamics: nn.Module
    t1: float = 1.0
    method: str = "rk4"
    rtol: float = 1e-3
    atol: float = 1e-4
    steps: int = 4              # fixed-grid substeps / scan bound per interval
    adjoint: Union[bool, str] = False
    remat: bool = False         # rematerialise dynamics on backward: trades
                                # one extra eval per stage for not storing
                                # stage activations (HBM ↔ FLOPs, the TPU
                                # memory lever for deep/many-step solves)

    @nn.compact
    def __call__(self, adj: Adj, h: jax.Array) -> jax.Array:
        dyn = self.dynamics
        params = self.param(
            "dynamics",
            lambda rng: dyn.init(rng, jnp.zeros((), h.dtype), adj, h)["params"],
        )

        def f(t, y, p):
            return dyn.apply({"params": p}, t, adj, y)

        if self.remat:
            f = jax.checkpoint(f)

        ts = jnp.asarray([0.0, self.t1], dtype=h.dtype)
        if self.adjoint:
            ys, stats = odeint_adjoint(
                f, h, ts, params,
                method=self.method, rtol=self.rtol, atol=self.atol,
                steps_per_interval=self.steps,
                max_steps_per_interval=self.steps,
                checkpoint=self.adjoint == "checkpoint",
                return_stats=True,
            )
            self.sow("intermediates", "ode_stats", stats)
        else:
            ys, stats = odeint(
                f, h, ts, params,
                method=self.method, rtol=self.rtol, atol=self.atol,
                steps_per_interval=self.steps,
                max_steps_per_interval=self.steps,
                return_stats=True,
            )
            self.sow("intermediates", "ode_stats", stats)
        return ys[-1]


class GCNODE(nn.Module):
    """Continuous-depth GCN classifier: encoder conv → ODEBlock → readout.

    The continuous counterpart of ``ResGCN`` (paper: residual h←h+f(h) taken
    to the ODE limit); BASELINE config[1] runs this with rk4(4 steps)."""

    hidden: int = 16
    n_class: int = 7
    dropout: float = 0.5
    t1: float = 1.0
    method: str = "rk4"
    steps: int = 4
    rtol: float = 1e-3
    atol: float = 1e-4
    adjoint: Union[bool, str] = False
    remat: bool = False
    activation: str = "tanh"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, adj: Adj, x: jax.Array, *, deterministic: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.relu(GCNLayer(self.hidden, **kw)(adj, x))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = ODEBlock(
            GCNDynamics(self.hidden, activation=self.activation, **kw),
            t1=self.t1, method=self.method, steps=self.steps,
            rtol=self.rtol, atol=self.atol, adjoint=self.adjoint,
            remat=self.remat,
        )(adj, h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = GCNLayer(self.n_class, **kw)(adj, h)
        return nn.log_softmax(h.astype(jnp.float32), axis=-1)


class GATODE(nn.Module):
    """Continuous-depth GAT classifier (BASELINE config[2]: dopri5)."""

    hidden: int = 8
    heads: int = 8
    n_class: int = 7
    dropout: float = 0.6
    t1: float = 1.0
    method: str = "dopri5_scan"
    steps: int = 32
    rtol: float = 1e-3
    atol: float = 1e-4
    adjoint: Union[bool, str] = False
    remat: bool = False
    activation: str = "tanh"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array, *, deterministic: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        h = nn.elu(
            GATLayer(self.hidden, heads=self.heads, attn_dropout=self.dropout, **kw)(
                g, x, deterministic=deterministic
            )
        )
        h = ODEBlock(
            GATDynamics(self.hidden * self.heads, activation=self.activation, **kw),
            t1=self.t1, method=self.method, steps=self.steps,
            rtol=self.rtol, atol=self.atol, adjoint=self.adjoint,
            remat=self.remat,
        )(g, h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = GATLayer(self.n_class, heads=1, concat=False, **kw)(
            g, h, deterministic=deterministic
        )
        return nn.log_softmax(h.astype(jnp.float32), axis=-1)
