"""Graph container: construction, normalisation, padding invariants."""

import jax.numpy as jnp
import numpy as np
import pytest

from graph_odenet_tpu.graph import Graph, from_edges, normalize_graph, to_dense


def tiny_graph(**kw):
    # 4-node path graph 0-1-2-3.
    return from_edges([0, 1, 2], [1, 2, 3], n_node=4, **kw)


def test_symmetrize_and_self_loops():
    g = tiny_graph(normalize=None)
    dense = np.asarray(to_dense(g))[:4, :4]
    expected = np.eye(4)
    for i, j in [(0, 1), (1, 2), (2, 3)]:
        expected[i, j] = expected[j, i] = 1.0
    np.testing.assert_allclose(dense, expected)


def test_row_normalization_rows_sum_to_one():
    g = tiny_graph(normalize="row")
    dense = np.asarray(to_dense(g))[:4, :4]
    np.testing.assert_allclose(dense.sum(axis=1), np.ones(4), atol=1e-6)


def test_sym_normalization_matches_formula():
    g = tiny_graph(normalize="sym")
    dense = np.asarray(to_dense(g))[:4, :4]
    a = np.eye(4)
    for i, j in [(0, 1), (1, 2), (2, 3)]:
        a[i, j] = a[j, i] = 1.0
    d = a.sum(axis=1)
    expected = a / np.sqrt(np.outer(d, d))
    np.testing.assert_allclose(dense, expected, atol=1e-6)


def test_padding_shapes_and_masks():
    g = tiny_graph(node_multiple=8, edge_multiple=128)
    assert g.n_node == 4 and g.n_node_pad == 8
    assert g.n_edge_pad == 128
    assert g.n_edge == 3 * 2 + 4  # symmetric path + self loops
    assert int(g.edge_mask().sum()) == g.n_edge
    assert int(g.node_mask().sum()) == 4
    # Padding edges are inert: weight 0, target node 0.
    w = np.asarray(g.weight)
    assert np.all(w[g.n_edge:] == 0.0)


def test_receiver_sorted():
    g = tiny_graph()
    r = np.asarray(g.receivers)[: g.n_edge]
    assert np.all(np.diff(r) >= 0)


def test_device_normalize_matches_host():
    g_host = tiny_graph(normalize="sym")
    g_dev = normalize_graph(tiny_graph(normalize=None), "sym")
    np.testing.assert_allclose(
        np.asarray(to_dense(g_host)), np.asarray(to_dense(g_dev)), atol=1e-6
    )


def test_duplicate_edges_deduplicated():
    g = from_edges([0, 0, 1], [1, 1, 0], n_node=2, normalize=None)
    dense = np.asarray(to_dense(g))[:2, :2]
    np.testing.assert_allclose(dense, np.ones((2, 2)))


def test_in_degree():
    g = tiny_graph(normalize=None)
    deg = np.asarray(g.in_degree())
    np.testing.assert_allclose(deg[:4], [2, 3, 3, 2])  # neighbors + self loop
    np.testing.assert_allclose(deg[4:], 0.0)
