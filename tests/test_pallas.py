"""Pallas SpMM kernel vs the segment-sum reference (SURVEY.md §4.2) —
interpret mode on CPU, compiled on real TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_odenet_tpu.graph import from_edges
from graph_odenet_tpu.ops import spmm
from graph_odenet_tpu.ops.pallas_spmm import prepare, spmm_pallas


def make_graph(rng, n=300, p=0.03):
    a = rng.random((n, n)) < p
    s, r = np.nonzero(a)
    return from_edges(s, r, n_node=n, normalize="row", node_multiple=128)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    g = make_graph(rng)
    csr = prepare(g)
    x = jnp.asarray(rng.standard_normal((g.n_node_pad, 128)), jnp.float32)
    return g, csr, x


def test_prepare_shapes(setup):
    g, csr, _ = setup
    assert csr.n_node_pad == g.n_node_pad
    assert csr.blk_ptr.shape == (csr.n_blocks + 1,)
    assert int(csr.blk_ptr[-1]) == g.n_edge
    assert int(csr.t_blk_ptr[-1]) == g.n_edge
    # rel indices in range.
    assert int(csr.rel.max()) < csr.block_rows and int(csr.rel.min()) >= 0


def test_pallas_spmm_matches_reference(setup):
    g, csr, x = setup
    expected = np.asarray(spmm(g, x))
    got = np.asarray(spmm_pallas(csr, x))
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)


def test_pallas_spmm_grad_matches_reference(setup):
    g, csr, x = setup

    def loss_p(x):
        return jnp.sum(jnp.sin(spmm_pallas(csr, x)))

    def loss_ref(x):
        return jnp.sum(jnp.sin(spmm(g, x)))

    gp = np.asarray(jax.grad(loss_p)(x))
    gr = np.asarray(jax.grad(loss_ref)(x))
    np.testing.assert_allclose(gp, gr, atol=1e-4, rtol=1e-4)


def test_pallas_spmm_skewed_degrees():
    """Hub node with degree ≫ E_CHUNK exercises the multi-chunk loop and
    the unaligned-start clamp."""
    rng = np.random.default_rng(1)
    n = 200
    hub_s = rng.integers(0, n, size=1500)
    hub_r = np.zeros(1500, dtype=np.int64)  # everything cites node 0
    extra_s = rng.integers(0, n, size=300)
    extra_r = rng.integers(0, n, size=300)
    g = from_edges(
        np.concatenate([hub_s, extra_s]),
        np.concatenate([hub_r, extra_r]),
        n_node=n, normalize="row", node_multiple=128,
    )
    csr = prepare(g)
    x = jnp.asarray(rng.standard_normal((g.n_node_pad, 128)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(spmm_pallas(csr, x)), np.asarray(spmm(g, x)),
        atol=1e-4, rtol=1e-4,
    )


def test_spmm_pallas_bf16_inputs(setup):
    """bf16 features flow through gather + kernel (the bf16-training tier);
    output matches the f32 reference at bf16 tolerance, grads included."""
    g, csr, x = setup
    got = spmm_pallas(csr, x.astype(jnp.bfloat16)).astype(jnp.float32)
    ref = np.asarray(spmm(g, x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-2, rtol=5e-2)

    gb = jax.grad(
        lambda x: jnp.sum(jnp.sin(spmm_pallas(csr, x).astype(jnp.float32)))
    )(x.astype(jnp.bfloat16))
    gr = jax.grad(lambda x: jnp.sum(jnp.sin(spmm(g, x))))(x)
    assert gb.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(gb, dtype=np.float32), np.asarray(gr), atol=5e-2, rtol=5e-2
    )


def test_spmm_pallas_zero_edge_blocks():
    """Receiver blocks with no incoming edges (n_chunks == 0) and isolated
    nodes: output rows must be exactly zero, not stale scratch."""
    import jax.numpy as jnp
    import numpy as np

    from graph_odenet_tpu.graph import from_edges
    from graph_odenet_tpu.ops.pallas_spmm import prepare, spmm_pallas

    rng = np.random.default_rng(7)
    n = 512  # 4 receiver blocks at BLOCK_ROWS=128
    # All edges land in block 0 receivers; blocks 1..3 are edgeless.
    s = rng.integers(0, n, size=300)
    r = rng.integers(0, 100, size=300)
    g = from_edges(
        s, r, n_node=n, normalize=None, add_self_loops=False,
        symmetrize=False, node_multiple=128,
    )
    csr = prepare(g)
    x = jnp.asarray(rng.standard_normal((g.n_node_pad, 128)), jnp.float32)
    out = np.asarray(spmm_pallas(csr, x))
    assert np.all(out[128:] == 0.0), "edgeless blocks must emit zeros"
    # Block 0 matches the dense reference.
    from graph_odenet_tpu.graph import to_dense

    ref = np.asarray(to_dense(g)) @ np.asarray(x)
    np.testing.assert_allclose(out[:128], ref[:128], rtol=1e-5, atol=1e-5)


def test_gat_pallas_zero_edge_blocks():
    """Edgeless receivers through the fused GAT kernels: zero output,
    denominators clamped (no NaNs), gradients finite."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graph_odenet_tpu.graph import from_edges
    from graph_odenet_tpu.ops.pallas_gat import gat_aggregate_pallas
    from graph_odenet_tpu.ops.pallas_spmm import prepare

    rng = np.random.default_rng(8)
    n, e, h, f = 384, 200, 2, 8
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, 100, size=e)
    g = from_edges(
        s, r, n_node=n, normalize=None, add_self_loops=False,
        symmetrize=False, node_multiple=128,
    )
    csr = prepare(g)
    logits = jnp.asarray(rng.standard_normal((g.n_edge_pad, h)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((g.n_node_pad, h, f)), jnp.float32)
    out = np.asarray(gat_aggregate_pallas(csr, logits, wh))
    assert np.isfinite(out).all()
    assert np.all(out[128:] == 0.0)
    grads = jax.grad(
        lambda lg, w: jnp.sum(gat_aggregate_pallas(csr, lg, w) ** 2),
        argnums=(0, 1),
    )(logits, wh)
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
