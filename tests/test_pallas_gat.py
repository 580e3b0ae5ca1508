"""Fused Pallas GAT attention vs the segment-softmax reference
(SURVEY.md §3.3 sandwich) — interpret mode on CPU, compiled on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_odenet_tpu.graph import from_edges
from graph_odenet_tpu.ops.pallas_gat import gat_aggregate_pallas
from graph_odenet_tpu.ops.pallas_spmm import prepare
from graph_odenet_tpu.ops.sddmm import attention_aggregate


def make_case(seed=0, n=300, p=0.03, heads=4, feat=16):
    rng = np.random.default_rng(seed)
    a = rng.random((n, n)) < p
    s, r = np.nonzero(a)
    g = from_edges(s, r, n_node=n, normalize=None, node_multiple=128)
    csr = prepare(g)
    logits = jnp.asarray(
        rng.standard_normal((g.n_edge_pad, heads)) * 2.0, jnp.float32
    )
    wh = jnp.asarray(
        rng.standard_normal((g.n_node_pad, heads, feat)), jnp.float32
    )
    return g, csr, logits, wh


@pytest.mark.parametrize(
    "heads,feat",
    [(4, 16), (1, 128), (8, 8),     # packed (H·F ≤ 128)
     (2, 96), (2, 128)],            # per-head planes (H·F > 128)
)
def test_fused_gat_matches_reference(heads, feat):
    g, csr, logits, wh = make_case(heads=heads, feat=feat)
    ref = np.asarray(attention_aggregate(g, logits, wh))
    got = np.asarray(gat_aggregate_pallas(csr, logits, wh))
    # Rows with no incoming edges: reference gives 0 (masked softmax), fused
    # kernel gives 0 (l clamp) — both zero, compare everything.
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_fused_gat_grads_match_reference():
    g, csr, logits, wh = make_case(heads=2, feat=8)

    def loss_p(lg, w):
        return jnp.sum(jnp.sin(gat_aggregate_pallas(csr, lg, w)))

    def loss_r(lg, w):
        return jnp.sum(jnp.sin(attention_aggregate(g, lg, w)))

    gp = jax.grad(loss_p, argnums=(0, 1))(logits, wh)
    gr = jax.grad(loss_r, argnums=(0, 1))(logits, wh)
    for a, b, name in [(gp[0], gr[0], "dlogits"), (gp[1], gr[1], "dwh")]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4, err_msg=name
        )


@pytest.mark.parametrize(
    "heads,feat",
    [(4, 16), (1, 128), (8, 8),     # packed (H·F ≤ 128)
     (2, 96), (2, 128)],            # per-head planes (H·F > 128)
)
def test_fused_bwd_matches_reference(heads, feat):
    """The fused Pallas backward (α/dlogit kernel) across layouts."""
    g, csr, logits, wh = make_case(seed=1, heads=heads, feat=feat)

    def loss_p(lg, w):
        return jnp.sum(jnp.cos(gat_aggregate_pallas(csr, lg, w)))

    def loss_r(lg, w):
        return jnp.sum(jnp.cos(attention_aggregate(g, lg, w)))

    gp = jax.grad(loss_p, argnums=(0, 1))(logits, wh)
    gr = jax.grad(loss_r, argnums=(0, 1))(logits, wh)
    for a, b, name in [(gp[0], gr[0], "dlogits"), (gp[1], gr[1], "dwh")]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4, err_msg=name
        )


def test_fused_bwd_matches_xla_bwd():
    """Both custom backward paths agree on the same inputs (bit-tight at
    the f32-exact tier; to the split-bf16 rounding bound otherwise)."""
    from graph_odenet_tpu.ops import pallas_gat
    from graph_odenet_tpu.ops.pallas_spmm import _MODE

    tol = 1e-5 if _MODE == "highest" else 5e-4
    _, csr, logits, wh = make_case(seed=2, heads=2, feat=16)
    out, res = pallas_gat._gat_fwd(csr, logits, wh)
    g = jnp.asarray(
        np.random.default_rng(5).standard_normal(out.shape), jnp.float32
    )
    dl_f, dwh_f = pallas_gat._bwd_fused(csr, res, g)
    dl_x, dwh_x = pallas_gat._bwd_xla(csr, res, g)
    np.testing.assert_allclose(np.asarray(dl_f), np.asarray(dl_x),
                               atol=tol, rtol=tol)
    np.testing.assert_allclose(np.asarray(dwh_f), np.asarray(dwh_x),
                               atol=tol, rtol=tol)


def test_fused_bwd_hub_receiver():
    """Hub node spans many E_CHUNKs: exercises the first-chunk overlap merge
    (select-RMW) and multi-chunk α reconstruction in the bwd kernel."""
    rng = np.random.default_rng(7)
    n = 200
    s = np.concatenate([rng.integers(0, n, 2500), rng.integers(0, n, 400)])
    r = np.concatenate([np.full(2500, 150, np.int64), rng.integers(0, n, 400)])
    g = from_edges(s, r, n_node=n, normalize=None, node_multiple=128)
    csr = prepare(g)
    logits = jnp.asarray(
        rng.standard_normal((g.n_edge_pad, 2)) * 2.0, jnp.float32
    )
    wh = jnp.asarray(rng.standard_normal((g.n_node_pad, 2, 16)), jnp.float32)

    def loss_p(lg, w):
        return jnp.sum(jnp.sin(gat_aggregate_pallas(csr, lg, w)))

    def loss_r(lg, w):
        return jnp.sum(jnp.sin(attention_aggregate(g, lg, w)))

    gp = jax.grad(loss_p, argnums=(0, 1))(logits, wh)
    gr = jax.grad(loss_r, argnums=(0, 1))(logits, wh)
    for a, b, name in [(gp[0], gr[0], "dlogits"), (gp[1], gr[1], "dwh")]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_fused_gat_hub_receiver():
    """Degree ≫ E_CHUNK receiver exercises multi-chunk online softmax."""
    rng = np.random.default_rng(3)
    n = 200
    s = np.concatenate([rng.integers(0, n, 1500), rng.integers(0, n, 300)])
    r = np.concatenate([np.zeros(1500, np.int64), rng.integers(0, n, 300)])
    g = from_edges(s, r, n_node=n, normalize=None, node_multiple=128)
    csr = prepare(g)
    logits = jnp.asarray(
        rng.standard_normal((g.n_edge_pad, 2)) * 3.0, jnp.float32
    )
    wh = jnp.asarray(rng.standard_normal((g.n_node_pad, 2, 16)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(gat_aggregate_pallas(csr, logits, wh)),
        np.asarray(attention_aggregate(g, logits, wh)),
        atol=2e-5, rtol=2e-5,
    )
