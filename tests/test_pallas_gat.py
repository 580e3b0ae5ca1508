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


def _segment_reference_with_mask(g, logits, wh, dmask):
    """Segment-path attention with an injected post-softmax α scale."""
    from graph_odenet_tpu.ops.segment import (
        gather, segment_softmax, segment_sum,
    )

    mask = g.edge_mask()[:, None]
    alpha = segment_softmax(logits, g.receivers, g.n_node_pad, mask=mask)
    alpha = alpha * dmask
    msgs = gather(wh, g.senders) * alpha[..., None]
    return segment_sum(msgs, g.receivers, num_segments=g.n_node_pad)


@pytest.mark.parametrize("heads,feat", [(2, 16), (2, 96)])
def test_fused_dropout_matches_reference(heads, feat):
    """Fused kernel with a dropout mask == segment path given the SAME mask,
    forward and gradients."""
    from graph_odenet_tpu.ops.pallas_gat import gat_aggregate_pallas_dropout

    g, csr, logits, wh = make_case(seed=4, heads=heads, feat=feat)
    rng = np.random.default_rng(11)
    rate = 0.4
    keep = rng.random((g.n_edge_pad, heads)) > rate
    dmask = jnp.asarray(keep / (1.0 - rate), jnp.float32)

    def loss_p(lg, w):
        return jnp.sum(jnp.sin(gat_aggregate_pallas_dropout(csr, lg, w, dmask)))

    def loss_r(lg, w):
        return jnp.sum(jnp.sin(_segment_reference_with_mask(g, lg, w, dmask)))

    np.testing.assert_allclose(
        np.asarray(gat_aggregate_pallas_dropout(csr, logits, wh, dmask)),
        np.asarray(_segment_reference_with_mask(g, logits, wh, dmask)),
        atol=2e-5, rtol=2e-5,
    )
    gp = jax.grad(loss_p, argnums=(0, 1))(logits, wh)
    gr = jax.grad(loss_r, argnums=(0, 1))(logits, wh)
    for a, b, name in [(gp[0], gr[0], "dlogits"), (gp[1], gr[1], "dwh")]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_fused_dropout_ones_mask_is_identity():
    from graph_odenet_tpu.ops.pallas_gat import gat_aggregate_pallas_dropout

    _, csr, logits, wh = make_case(seed=5, heads=4, feat=16)
    ones = jnp.ones_like(logits)
    np.testing.assert_allclose(
        np.asarray(gat_aggregate_pallas_dropout(csr, logits, wh, ones)),
        np.asarray(gat_aggregate_pallas(csr, logits, wh)),
        atol=1e-6, rtol=1e-6,
    )


def test_attention_aggregate_dropout_uses_fused_path():
    """attention_aggregate on PallasCSR with dropout matches the fused
    dropout op fed the same XLA-drawn mask (i.e. no segment fallback)."""
    from graph_odenet_tpu.ops.pallas_gat import gat_aggregate_pallas_dropout

    _, csr, logits, wh = make_case(seed=6, heads=2, feat=16)
    rate, key = 0.3, jax.random.PRNGKey(9)
    got = attention_aggregate(
        csr, logits, wh, edge_dropout_rng=key, edge_dropout_rate=rate
    )
    keep = jax.random.bernoulli(key, 1.0 - rate, logits.shape)
    dmask = keep.astype(jnp.float32) / (1.0 - rate)
    want = gat_aggregate_pallas_dropout(csr, logits, wh, dmask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


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


def make_scores_case(seed=0, n=300, p=0.03, heads=8, feat=8, slope=0.2):
    """Case where logits come from the decomposed GAT scores (edge_scores),
    so the recompute-α backward hint applies."""
    from graph_odenet_tpu.ops.sddmm import edge_scores

    rng = np.random.default_rng(seed)
    a = rng.random((n, n)) < p
    s, r = np.nonzero(a)
    g = from_edges(s, r, n_node=n, normalize=None, node_multiple=128)
    csr = prepare(g)
    s_src = jnp.asarray(
        rng.standard_normal((g.n_node_pad, heads)) * 1.5, jnp.float32
    )
    s_dst = jnp.asarray(
        rng.standard_normal((g.n_node_pad, heads)) * 1.5, jnp.float32
    )
    logits = edge_scores(g, s_src, s_dst, negative_slope=slope)
    wh = jnp.asarray(
        rng.standard_normal((g.n_node_pad, heads, feat)), jnp.float32
    )
    return g, csr, logits, wh, s_src, s_dst


@pytest.mark.parametrize(
    "heads,feat",
    [(8, 8), (4, 16), (1, 64),    # recompute path, side lanes in-table
     (1, 128),                    # recompute path, wide two-plane side
     (2, 96)],                    # H·F > 128 → permuted-α fallback
)
def test_scores_hint_grads_match_reference(heads, feat):
    """gat_aggregate_pallas_scores (recompute-α backward) == segment path."""
    from graph_odenet_tpu.ops.pallas_gat import gat_aggregate_pallas_scores

    g, csr, logits, wh, s_src, s_dst = make_scores_case(
        seed=8, heads=heads, feat=feat
    )

    def loss_p(lg, w):
        return jnp.sum(jnp.sin(
            gat_aggregate_pallas_scores(csr, 0.2, lg, w, s_src, s_dst)
        ))

    def loss_r(lg, w):
        return jnp.sum(jnp.sin(attention_aggregate(g, lg, w)))

    np.testing.assert_allclose(
        np.asarray(gat_aggregate_pallas_scores(
            csr, 0.2, logits, wh, s_src, s_dst
        )),
        np.asarray(attention_aggregate(g, logits, wh)),
        atol=2e-5, rtol=2e-5,
    )
    gp = jax.grad(loss_p, argnums=(0, 1))(logits, wh)
    gr = jax.grad(loss_r, argnums=(0, 1))(logits, wh)
    for a, b, name in [(gp[0], gr[0], "dlogits"), (gp[1], gr[1], "dwh")]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_scores_hint_zero_cotangent():
    """The score tables are hints: their cotangents are identically zero
    (their real gradient flows through logits via edge_scores' vjp)."""
    from graph_odenet_tpu.ops.pallas_gat import gat_aggregate_pallas_scores

    _, csr, logits, wh, s_src, s_dst = make_scores_case(seed=9)
    gs = jax.grad(
        lambda a, b: jnp.sum(
            gat_aggregate_pallas_scores(csr, 0.2, logits, wh, a, b) ** 2
        ),
        argnums=(0, 1),
    )(s_src, s_dst)
    assert float(jnp.abs(gs[0]).max()) == 0.0
    assert float(jnp.abs(gs[1]).max()) == 0.0


def test_scores_hint_matches_permute_knob(monkeypatch):
    """GODE_GAT_DWH=permute disables the recompute kernel; both paths give
    the same dWh (knob wiring + numerical agreement)."""
    from graph_odenet_tpu.ops.pallas_gat import gat_aggregate_pallas_scores

    _, csr, logits, wh, s_src, s_dst = make_scores_case(seed=10, heads=4,
                                                        feat=16)

    def grads():
        return jax.grad(
            lambda lg, w: jnp.sum(jnp.sin(
                gat_aggregate_pallas_scores(csr, 0.2, lg, w, s_src, s_dst)
            )),
            argnums=(0, 1),
        )(logits, wh)

    g_rec = grads()
    monkeypatch.setenv("GODE_GAT_DWH", "permute")
    g_perm = grads()
    for a, b in zip(g_rec, g_perm):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5
        )


def test_scores_hint_hub_sender():
    """Out-degree hub spans many E_CHUNKs in the CSC (sender-block) view —
    exercises the recompute kernel's multi-chunk loop and overlap masking."""
    from graph_odenet_tpu.ops.sddmm import edge_scores
    from graph_odenet_tpu.ops.pallas_gat import gat_aggregate_pallas_scores

    rng = np.random.default_rng(12)
    n, heads, feat = 200, 4, 16
    s = np.concatenate([np.full(2500, 60, np.int64), rng.integers(0, n, 400)])
    r = np.concatenate([rng.integers(0, n, 2500), rng.integers(0, n, 400)])
    g = from_edges(s, r, n_node=n, normalize=None, node_multiple=128)
    csr = prepare(g)
    s_src = jnp.asarray(rng.standard_normal((g.n_node_pad, heads)), jnp.float32)
    s_dst = jnp.asarray(rng.standard_normal((g.n_node_pad, heads)), jnp.float32)
    logits = edge_scores(g, s_src, s_dst)
    wh = jnp.asarray(
        rng.standard_normal((g.n_node_pad, heads, feat)), jnp.float32
    )

    def loss_p(lg, w):
        return jnp.sum(jnp.sin(
            gat_aggregate_pallas_scores(csr, 0.2, lg, w, s_src, s_dst)
        ))

    def loss_r(lg, w):
        return jnp.sum(jnp.sin(attention_aggregate(g, lg, w)))

    gp = jax.grad(loss_p, argnums=(0, 1))(logits, wh)
    gr = jax.grad(loss_r, argnums=(0, 1))(logits, wh)
    for a, b, name in [(gp[0], gr[0], "dlogits"), (gp[1], gr[1], "dwh")]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_gat_layer_uses_scores_hint_on_csr():
    """GATLayer on a PallasCSR adjacency trains through the scores-hint op
    (deterministic eval path) and matches the Graph segment path."""
    from graph_odenet_tpu.models.gat import GATLayer

    rng = np.random.default_rng(13)
    n = 200
    a = rng.random((n, n)) < 0.04
    s, r = np.nonzero(a)
    g = from_edges(s, r, n_node=n, normalize=None, node_multiple=128)
    csr = prepare(g)
    x = jnp.asarray(rng.standard_normal((g.n_node_pad, 32)), jnp.float32)
    layer = GATLayer(8, heads=8)
    params = layer.init({"params": jax.random.PRNGKey(0)}, g, x)["params"]

    def loss(params, adj):
        return jnp.sum(
            jnp.sin(layer.apply({"params": params}, adj, x)))

    v_g, grad_g = jax.value_and_grad(loss)(params, g)
    v_c, grad_c = jax.value_and_grad(loss)(params, csr)
    np.testing.assert_allclose(float(v_g), float(v_c), atol=1e-4, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        ),
        grad_g, grad_c,
    )


# --- Counter-based regenerable attention dropout (VERDICT r2 #2) ----------


def test_dropmask_deterministic_and_rate():
    from graph_odenet_tpu.ops.dropmask import attention_dropout_scale

    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.integers(0, 5000, 20_000), jnp.int32)
    r = jnp.asarray(rng.integers(0, 5000, 20_000), jnp.int32)
    m1 = attention_dropout_scale(jnp.uint32(42), s, r, 8, 0.6)
    m2 = attention_dropout_scale(jnp.uint32(42), s, r, 8, 0.6)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    # Empirical keep rate ~ 1-rate (binomial; 160k draws, ±1%).
    keep = float(jnp.mean((m1 > 0).astype(jnp.float32)))
    assert abs(keep - 0.4) < 0.01, keep
    # Different seeds give different masks; kept entries carry 1/(1-rate).
    m3 = attention_dropout_scale(jnp.uint32(43), s, r, 8, 0.6)
    assert np.any(np.asarray(m1) != np.asarray(m3))
    vals = np.unique(np.asarray(m1))
    np.testing.assert_allclose(vals, [0.0, 1.0 / 0.4], rtol=1e-6)


@pytest.mark.parametrize("heads,feat", [(8, 8), (2, 16), (4, 16)])
def test_scores_dropout_fwd_matches_injected_mask(heads, feat):
    """The scores+seed op's forward must equal the plain dropout op fed the
    XLA-side generated counter mask (same hash, same key)."""
    from graph_odenet_tpu.ops.dropmask import attention_dropout_scale
    from graph_odenet_tpu.ops.pallas_gat import (
        gat_aggregate_pallas_dropout,
        gat_aggregate_pallas_scores_dropout,
    )
    from graph_odenet_tpu.ops.sddmm import edge_scores

    g, csr, _, wh = make_case(seed=5, heads=heads, feat=feat)
    rng = np.random.default_rng(7)
    s_src = jnp.asarray(rng.standard_normal((g.n_node_pad, heads)), jnp.float32)
    s_dst = jnp.asarray(rng.standard_normal((g.n_node_pad, heads)), jnp.float32)
    logits = edge_scores(g, s_src, s_dst)
    seed = jnp.uint32(123)
    rate = 0.6
    dmask = attention_dropout_scale(seed, csr.senders, csr.receivers, heads, rate)
    ref = gat_aggregate_pallas_dropout(csr, logits, wh, dmask)
    got = gat_aggregate_pallas_scores_dropout(
        csr, 0.2, rate, logits, wh, s_src, s_dst, seed
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.parametrize("heads,feat", [(8, 8), (2, 16), (1, 128)])
def test_scores_dropout_grads_match_permute_path(heads, feat):
    """dWh via the in-kernel mask-regenerating recompute path must match the
    α·D-permute weighted path given the identical counter mask."""
    from graph_odenet_tpu.ops.dropmask import attention_dropout_scale
    from graph_odenet_tpu.ops.pallas_gat import (
        _use_recompute,
        gat_aggregate_pallas_dropout,
        gat_aggregate_pallas_scores_dropout,
    )
    from graph_odenet_tpu.ops.sddmm import edge_scores

    assert _use_recompute(heads, feat, object(), with_dropout=True)
    g, csr, _, wh = make_case(seed=6, heads=heads, feat=feat)
    rng = np.random.default_rng(8)
    s_src = jnp.asarray(rng.standard_normal((g.n_node_pad, heads)), jnp.float32)
    s_dst = jnp.asarray(rng.standard_normal((g.n_node_pad, heads)), jnp.float32)
    logits = edge_scores(g, s_src, s_dst)
    seed = jnp.uint32(2024)
    rate = 0.5
    dmask = attention_dropout_scale(seed, csr.senders, csr.receivers, heads, rate)

    def loss_fast(lg, w):
        return jnp.sum(jnp.sin(gat_aggregate_pallas_scores_dropout(
            csr, 0.2, rate, lg, w, s_src, s_dst, seed
        )))

    def loss_perm(lg, w):
        return jnp.sum(jnp.sin(gat_aggregate_pallas_dropout(csr, lg, w, dmask)))

    gf = jax.grad(loss_fast, argnums=(0, 1))(logits, wh)
    gp = jax.grad(loss_perm, argnums=(0, 1))(logits, wh)
    for a, b, name in [(gf[0], gp[0], "dlogits"), (gf[1], gp[1], "dwh")]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4, err_msg=name
        )


def test_scores_dropout_lane_squeeze_uses_wide_plane():
    """H=1/F=125 (125+3+1=129 > 128 lanes) takes the two-plane wide
    recompute path (round-4: side values on a second 128-lane gather) and
    must match the explicit-mask op's gradients."""
    from graph_odenet_tpu.ops.dropmask import attention_dropout_scale
    from graph_odenet_tpu.ops.pallas_gat import (
        _use_recompute,
        gat_aggregate_pallas_dropout,
        gat_aggregate_pallas_scores_dropout,
    )
    from graph_odenet_tpu.ops.sddmm import edge_scores

    heads, feat = 1, 125
    # The wide side plane removed the lane-budget fallback (round-3 the
    # assert here pinned the opposite).
    assert _use_recompute(heads, feat, object(), with_dropout=True)
    g, csr, _, wh = make_case(seed=9, heads=heads, feat=feat)
    rng = np.random.default_rng(10)
    s_src = jnp.asarray(rng.standard_normal((g.n_node_pad, heads)), jnp.float32)
    s_dst = jnp.asarray(rng.standard_normal((g.n_node_pad, heads)), jnp.float32)
    logits = edge_scores(g, s_src, s_dst)
    seed = jnp.uint32(77)
    rate = 0.4
    dmask = attention_dropout_scale(seed, csr.senders, csr.receivers, heads, rate)

    def loss_fast(lg, w):
        return jnp.sum(gat_aggregate_pallas_scores_dropout(
            csr, 0.2, rate, lg, w, s_src, s_dst, seed
        ))

    def loss_perm(lg, w):
        return jnp.sum(gat_aggregate_pallas_dropout(csr, lg, w, dmask))

    gf = jax.grad(loss_fast, argnums=(0, 1))(logits, wh)
    gp = jax.grad(loss_perm, argnums=(0, 1))(logits, wh)
    for a, b in zip(gf, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("mode", ["chunkshift", "scan"])
def test_packed_softmax_extreme_negative_spread(monkeypatch, mode):
    """The chunkshift caveat case (VERDICT r4 #5): a receiver whose whole
    chunk-local logit set sits far below the sub-chunk max must NOT flush
    out of the softmax — the count-plane rescue re-runs the exact scan."""
    from graph_odenet_tpu.ops import pallas_gat as pg

    monkeypatch.setattr(pg, "_PACKED_SOFTMAX", mode)
    g, csr, logits, wh = make_case(seed=3, heads=8, feat=8)
    rng = np.random.default_rng(4)
    # Per-ORIGINAL-edge receiver ids come from the graph, not the CSR perm.
    rcv = np.asarray(g.receivers)
    lg = np.array(logits)  # writable copy
    # Drown two receivers ~300 below everyone else (spread ≫ bias+88) and
    # push one receiver ~200 above (reference's own shift handles it).
    low = np.isin(rcv, [5, 17])
    high = rcv == 40
    lg[low[: lg.shape[0]]] = -300.0 + rng.standard_normal(
        (int(low[: lg.shape[0]].sum()), lg.shape[1])
    )
    lg[high[: lg.shape[0]]] = 200.0 + rng.standard_normal(
        (int(high[: lg.shape[0]].sum()), lg.shape[1])
    )
    lg = jnp.asarray(lg)
    ref = np.asarray(attention_aggregate(g, lg, wh))
    got = np.asarray(gat_aggregate_pallas(csr, lg, wh))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)
    # Gradients survive the rescue too (backward reuses the exact m/l).
    gp = jax.grad(lambda l, w: jnp.sum(jnp.sin(
        gat_aggregate_pallas(csr, l, w))), argnums=(0, 1))(lg, wh)
    gr = jax.grad(lambda l, w: jnp.sum(jnp.sin(
        attention_aggregate(g, l, w))), argnums=(0, 1))(lg, wh)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
        )
