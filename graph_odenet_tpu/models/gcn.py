"""GCN — graph convolution layer and 2-layer classifier.

Parity: reference ``GraphConvolution`` (``out = spmm(Â, X·W) + b``,
SURVEY.md §2 R2) and the 2-layer ``GCN`` (hidden 16, dropout 0.5, ReLU,
log_softmax — §3.2), plus the paper's residual variant (§2 R5).

TPU notes: the dense ``X·W`` matmul is the MXU work; aggregation goes
through ``ops.spmm`` which takes either the sparse ``Graph`` or a
pre-densified Â (fastest for Cora-scale graphs).  Feature dims should be
padded to lane multiples (128) by the data layer for peak MXU utilisation.
"""

from __future__ import annotations

from typing import Any, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from graph_odenet_tpu.graph import Graph
from graph_odenet_tpu.ops import spmm

Adj = Union[Graph, jax.Array]


class GCNLayer(nn.Module):
    """``h' = Â (h W) + b`` — one graph convolution."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, adj: Adj, x: jax.Array) -> jax.Array:
        support = nn.Dense(
            self.features,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.glorot_uniform(),
        )(x)
        out = spmm(adj, support)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            out = out + bias.astype(out.dtype)
        return out


class GCN(nn.Module):
    """2-layer GCN node classifier (reference §3.2 call stack).

    forward: relu(gc1(x)) → dropout → gc2 → log_softmax
    """

    hidden: int = 16
    n_class: int = 7
    dropout: float = 0.5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, adj: Adj, x: jax.Array, *, deterministic: bool = True):
        h = nn.relu(GCNLayer(self.hidden, dtype=self.dtype, param_dtype=self.param_dtype)(adj, x))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = GCNLayer(self.n_class, dtype=self.dtype, param_dtype=self.param_dtype)(adj, h)
        return nn.log_softmax(h.astype(jnp.float32), axis=-1)


class ResGCN(nn.Module):
    """Residual GCN — the paper's discrete deep-residual baseline (R5):
    input projection, ``n_blocks`` residual graph-conv blocks
    ``h ← h + σ(Â h W)``, linear readout.  The continuous-depth limit of
    this model is ``GCNODE``."""

    hidden: int = 16
    n_class: int = 7
    n_blocks: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, adj: Adj, x: jax.Array, *, deterministic: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.relu(GCNLayer(self.hidden, **kw)(adj, x))
        for _ in range(self.n_blocks):
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = h + nn.relu(GCNLayer(self.hidden, **kw)(adj, h))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = GCNLayer(self.n_class, **kw)(adj, h)
        return nn.log_softmax(h.astype(jnp.float32), axis=-1)
