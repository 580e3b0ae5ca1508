"""GAT — multi-head graph attention in edge-list (SDDMM) form.

Parity: reference ``GraphAttentionLayer`` / ``SpGraphAttentionLayer``
(SURVEY.md §2 R3/R4) and the standard GAT classifier (8 heads × 8 hidden,
ELU, dropout 0.6).  The dense reference materialises N×N attention scores
and masks non-edges with −∞; the sparse one drives a custom autograd
Function over ``torch.sparse.mm``.  Here there is a single formulation —
scores live only on the edge list:

    e_ij = LeakyReLU(a_srcᵀWh_i + a_dstᵀWh_j)   (ops.edge_scores, SDDMM)
    α    = segment_softmax(e, receivers)
    h'   = segment_sum(α · Wh_src)               (ops.attention_aggregate)

which is mathematically identical to both reference layers and is the shape
XLA/Pallas want (SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from graph_odenet_tpu.graph import Graph
from graph_odenet_tpu.ops import attention_aggregate, edge_scores


class GATLayer(nn.Module):
    """Multi-head graph attention layer.

    Output is ``[N, heads*features]`` when ``concat`` else the head-mean
    ``[N, features]`` (reference: hidden layers concat, output layer
    averages).
    """

    features: int
    heads: int = 8
    concat: bool = True
    negative_slope: float = 0.2
    attn_dropout: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array, *, deterministic: bool = True):
        H, F = self.heads, self.features
        wh = nn.DenseGeneral(
            (H, F),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.glorot_uniform(),
        )(x)  # [N, H, F]

        # Decomposed attention vector a = [a_src ‖ a_dst]: per-node scalar
        # scores instead of per-edge F-dim concat (same math, O(N·F + E)).
        a_src = self.param(
            "attn_src", nn.initializers.glorot_uniform(), (1, H, F), self.param_dtype
        )
        a_dst = self.param(
            "attn_dst", nn.initializers.glorot_uniform(), (1, H, F), self.param_dtype
        )
        s_src = jnp.sum(wh * a_src.astype(wh.dtype), axis=-1)  # [N, H]
        s_dst = jnp.sum(wh * a_dst.astype(wh.dtype), axis=-1)  # [N, H]

        logits = edge_scores(g, s_src, s_dst, negative_slope=self.negative_slope)
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.attn_dropout > 0.0)
            else None
        )
        out = attention_aggregate(
            g,
            logits.astype(jnp.float32),
            wh,
            edge_dropout_rng=rng,
            edge_dropout_rate=0.0 if deterministic else self.attn_dropout,
            scores=(
                s_src.astype(jnp.float32), s_dst.astype(jnp.float32)
            ),
            negative_slope=self.negative_slope,
        )  # [N, H, F]
        if self.concat:
            return out.reshape(out.shape[0], H * F)
        return jnp.mean(out, axis=1)


class GAT(nn.Module):
    """2-layer GAT classifier: 8×8 concat + ELU, then head-averaged output
    layer, log_softmax (Veličković et al. 2018 config the reference uses)."""

    hidden: int = 8
    heads: int = 8
    out_heads: int = 1
    n_class: int = 7
    dropout: float = 0.6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array, *, deterministic: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        h = GATLayer(
            self.hidden, heads=self.heads, attn_dropout=self.dropout, **kw
        )(g, x, deterministic=deterministic)
        h = nn.elu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = GATLayer(
            self.n_class,
            heads=self.out_heads,
            concat=False,
            attn_dropout=self.dropout,
            **kw,
        )(g, h, deterministic=deterministic)
        return nn.log_softmax(h.astype(jnp.float32), axis=-1)


class ResGAT(nn.Module):
    """Residual GAT: projection, ``n_blocks`` of ``h ← h + elu(att(h))``,
    head-averaged readout (paper's discrete-residual attention variant)."""

    hidden: int = 8
    heads: int = 8
    n_class: int = 7
    n_blocks: int = 2
    dropout: float = 0.6
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
        dim = self.hidden * self.heads
        for _ in range(self.n_blocks):
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            # Per-block attention keeps width constant so the residual adds.
            blk = GATLayer(
                dim, heads=1, concat=False, attn_dropout=self.dropout, **kw
            )(g, h, deterministic=deterministic)
            h = h + nn.elu(blk)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = GATLayer(self.n_class, heads=1, concat=False, **kw)(
            g, h, deterministic=deterministic
        )
        return nn.log_softmax(h.astype(jnp.float32), axis=-1)
