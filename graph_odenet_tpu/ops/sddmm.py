"""SDDMM + masked softmax + SpMM — the sparse-attention sandwich.

This is the compute pattern of the reference's GAT layers (SURVEY.md §3.3):

    Wh   = h @ W
    e_ij = LeakyReLU(a_srcᵀ Wh_i + a_dstᵀ Wh_j)      # SDDMM: score per edge
    α    = softmax_j(e_ij)                            # per-receiver softmax
    h'_i = Σ_j α_ij · Wh_j                            # SpMM

The reference computes dense N×N scores then masks non-edges with −∞
(``GraphAttentionLayer``) or drives a custom autograd Function over
``torch.sparse.mm`` (``SpGraphAttentionLayer``).  TPU-native form: scores
exist only on the edge list; softmax is ``segment_softmax``; everything is
gather/segment ops the compiler fuses, with a Pallas fused kernel available
for large graphs.

The per-edge decomposition ``e_ij = s_src[i] + s_dst[j]`` (where
``s_src = Wh @ a_src``) turns the SDDMM into two dense matvecs plus a
per-edge gather-add — O(N·F + E) instead of O(E·F) — exactly the trick the
reference's sparse layer uses implicitly via ``a[:F]``/``a[F:]`` splitting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graph_odenet_tpu.graph import Graph
from graph_odenet_tpu.ops.segment import gather, segment_softmax, segment_sum

__all__ = ["edge_scores", "attention_aggregate"]


def edge_scores(
    g: Graph,
    s_src: jax.Array,
    s_dst: jax.Array,
    *,
    negative_slope: float = 0.2,
) -> jax.Array:
    """Per-edge attention logits ``LeakyReLU(s_src[sender] + s_dst[receiver])``.

    Args:
      s_src: ``[N_pad, H]`` source-side scores (``Wh @ a_src`` per head).
      s_dst: ``[N_pad, H]`` destination-side scores.

    Returns ``[E_pad, H]`` logits (padding edges included — mask downstream).
    """
    e = gather(s_src, g.senders) + gather(s_dst, g.receivers)
    return jax.nn.leaky_relu(e, negative_slope=negative_slope)


def attention_aggregate(
    g: Graph,
    logits: jax.Array,
    values: jax.Array,
    *,
    edge_dropout_rng: jax.Array | None = None,
    edge_dropout_rate: float = 0.0,
    scores: tuple[jax.Array, jax.Array] | None = None,
    negative_slope: float = 0.2,
) -> jax.Array:
    """softmax over incoming edges, then attention-weighted value sum.

    Args:
      logits: ``[E_pad, H]`` edge logits.
      values: ``[N_pad, H, F]`` per-head node values (``Wh`` reshaped).
      edge_dropout_*: the reference applies dropout to attention
        coefficients after the softmax (GAT convention); same here.
      scores: optional ``(s_src, s_dst)`` node tables such that ``logits ==
        edge_scores(g, s_src, s_dst, negative_slope=negative_slope)`` —
        lets the fused Pallas backward recompute α in CSC order instead of
        paying the narrow [E, H] edge-permute gather.  Purely a speed hint;
        gradients still flow through ``logits``.

    Returns ``[N_pad, H, F]`` aggregated features.
    """
    # PallasCSR adjacency → fused SDDMM-softmax-SpMM kernel (TPU fast path).
    # Attention dropout stays on the fused path: the keep mask is drawn
    # XLA-side ([E, H], cheap) and streamed into the kernel as an α scale,
    # so training with the reference's attn dropout keeps kernel speed.
    if type(g).__name__ == "PallasCSR":
        from graph_odenet_tpu.ops.dropmask import seed_from_key
        from graph_odenet_tpu.ops.pallas_gat import (
            gat_aggregate_pallas,
            gat_aggregate_pallas_dropout,
            gat_aggregate_pallas_scores,
            gat_aggregate_pallas_scores_dropout,
        )

        if edge_dropout_rng is None or edge_dropout_rate == 0.0:
            if scores is not None:
                return gat_aggregate_pallas_scores(
                    g, negative_slope, logits, values, scores[0], scores[1]
                )
            return gat_aggregate_pallas(g, logits, values)
        if scores is not None:
            # Counter-based mask (ops.dropmask): the backward regenerates
            # it in CSC order in-kernel, keeping the fast dWh path live
            # under the reference's attention dropout.
            return gat_aggregate_pallas_scores_dropout(
                g, negative_slope, edge_dropout_rate, logits, values,
                scores[0], scores[1], seed_from_key(edge_dropout_rng),
            )
        keep = jax.random.bernoulli(
            edge_dropout_rng, 1.0 - edge_dropout_rate, logits.shape
        )
        dmask = keep.astype(jnp.float32) / (1.0 - edge_dropout_rate)
        return gat_aggregate_pallas_dropout(g, logits, values, dmask)

    mask = g.edge_mask()[:, None]
    alpha = segment_softmax(logits, g.receivers, g.n_node_pad, mask=mask)
    if edge_dropout_rng is not None and edge_dropout_rate > 0.0:
        # Same counter-based mask the Pallas path regenerates in-kernel
        # (ops.dropmask) so segment and fused paths apply IDENTICAL masks
        # — apples-to-apples numerics in tests and benchmarks.
        from graph_odenet_tpu.ops.dropmask import (
            attention_dropout_scale, seed_from_key,
        )

        alpha = alpha * attention_dropout_scale(
            seed_from_key(edge_dropout_rng), g.senders, g.receivers,
            alpha.shape[1], edge_dropout_rate,
        )
    msgs = gather(values, g.senders) * alpha[..., None].astype(values.dtype)
    return segment_sum(msgs, g.receivers, num_segments=g.n_node_pad)
