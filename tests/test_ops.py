"""Sparse aggregation ops vs dense ground truth (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_odenet_tpu.graph import from_edges, to_dense
from graph_odenet_tpu.ops import (
    attention_aggregate,
    edge_scores,
    segment_softmax,
    segment_sum,
    spmm,
)


def random_graph(rng, n=50, p=0.1):
    a = rng.random((n, n)) < p
    s, r = np.nonzero(a)
    return from_edges(s, r, n_node=n, normalize="row")


def test_spmm_matches_dense():
    rng = np.random.default_rng(0)
    g = random_graph(rng)
    x = jnp.asarray(rng.standard_normal((g.n_node_pad, 13)), jnp.float32)
    sparse = spmm(g, x)
    dense = spmm(to_dense(g), x)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense), atol=1e-5)


def test_spmm_grad_matches_dense():
    rng = np.random.default_rng(1)
    g = random_graph(rng, n=20)
    x = jnp.asarray(rng.standard_normal((g.n_node_pad, 7)), jnp.float32)
    a = to_dense(g)
    f_sparse = lambda x: jnp.sum(jnp.sin(spmm(g, x)))
    f_dense = lambda x: jnp.sum(jnp.sin(spmm(a, x)))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_sparse)(x)),
        np.asarray(jax.grad(f_dense)(x)),
        atol=1e-5,
    )


def test_segment_softmax_rows_sum_to_one():
    rng = np.random.default_rng(2)
    g = random_graph(rng, n=30)
    logits = jnp.asarray(rng.standard_normal(g.n_edge_pad), jnp.float32)
    alpha = segment_softmax(
        logits, g.receivers, g.n_node_pad, mask=g.edge_mask()
    )
    sums = np.asarray(
        segment_sum(alpha, g.receivers, g.n_node_pad)
    )
    # Rows with at least one real incoming edge sum to 1 (every node has a
    # self loop here), padding rows to 0.
    np.testing.assert_allclose(sums[: g.n_node], 1.0, atol=1e-6)
    np.testing.assert_allclose(sums[g.n_node :], 0.0, atol=1e-6)


def test_attention_aggregate_matches_dense_masked_softmax():
    """The edge-list GAT sandwich equals the reference's dense −∞-masked
    softmax formulation (SURVEY.md §3.3)."""
    rng = np.random.default_rng(3)
    n, h, f = 12, 2, 5
    g = random_graph(rng, n=n)
    s_src = jnp.asarray(rng.standard_normal((g.n_node_pad, h)), jnp.float32)
    s_dst = jnp.asarray(rng.standard_normal((g.n_node_pad, h)), jnp.float32)
    values = jnp.asarray(
        rng.standard_normal((g.n_node_pad, h, f)), jnp.float32
    )

    logits = edge_scores(g, s_src, s_dst)
    out = attention_aggregate(g, logits, values)

    # Dense reference computation.
    adj = np.asarray(to_dense(g)) != 0  # [N,N] receiver-major
    se = np.asarray(s_src)[None, :, :] + np.asarray(s_dst)[:, None, :]  # [r,s,H]
    se = np.where(se > 0, se, 0.2 * se)
    se = np.where(adj[:, :, None], se, -np.inf)
    m = se.max(axis=1, keepdims=True)
    m[~np.isfinite(m)] = 0.0
    se = se - m
    num = np.exp(se)
    num[~adj] = 0.0
    alpha = num / np.maximum(num.sum(axis=1, keepdims=True), 1e-30)
    expected = np.einsum("rsh,shf->rhf", alpha, np.asarray(values))
    np.testing.assert_allclose(
        np.asarray(out)[: g.n_node], expected[: g.n_node], atol=1e-5
    )


def test_ops_jit_and_vmap_compose():
    rng = np.random.default_rng(4)
    g = random_graph(rng, n=16)
    xs = jnp.asarray(rng.standard_normal((3, g.n_node_pad, 6)), jnp.float32)
    batched = jax.jit(jax.vmap(lambda x: spmm(g, x)))(xs)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(spmm(g, xs[i])), atol=1e-6
        )
