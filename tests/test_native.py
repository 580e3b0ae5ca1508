"""Native C++ graph-builder vs the numpy pipeline: identical outputs."""

import numpy as np
import pytest

from graph_odenet_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.load()
    if l is None:
        pytest.skip("native library unavailable (no g++?)")
    return l


@pytest.mark.parametrize("normalize", [None, "row", "sym"])
def test_native_matches_numpy_pipeline(lib, normalize, monkeypatch):
    import graph_odenet_tpu.graph as G

    rng = np.random.default_rng(0)
    n, e = 500, 4000
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)

    g_native = G.from_edges(s, r, n_node=n, normalize=normalize)

    # Force the numpy path by making the native loader report unavailable.
    monkeypatch.setattr(native, "preprocess_edges", lambda *a, **k: None)
    g_numpy = G.from_edges(s, r, n_node=n, normalize=normalize)

    assert g_native.n_edge == g_numpy.n_edge
    np.testing.assert_array_equal(
        np.asarray(g_native.senders), np.asarray(g_numpy.senders)
    )
    np.testing.assert_array_equal(
        np.asarray(g_native.receivers), np.asarray(g_numpy.receivers)
    )
    np.testing.assert_allclose(
        np.asarray(g_native.weight), np.asarray(g_numpy.weight), atol=1e-6
    )


def test_build_blocks(lib):
    recv = np.array([0, 0, 3, 128, 129, 300], dtype=np.int64)
    ptr = native.build_blocks(recv, 128, 3)
    np.testing.assert_array_equal(ptr, [0, 3, 5, 6])
