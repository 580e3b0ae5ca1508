"""Decompose the fused GAT fwd+bwd time into its phases (round-3 VERDICT
weak #1 / next #2): forward, full backward, and the dWh CSC pass — the
same roofline-style bisection that drove the SpMM wins.

Usage: python scripts/gat_bwd_decomp.py [heads feat [dropout]]
Writes one JSON line per phase; run on the TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from graph_odenet_tpu.bench import powerlaw_graph
from graph_odenet_tpu.ops import dropmask as dm
from graph_odenet_tpu.ops.pallas_spmm import prepare
from graph_odenet_tpu.ops.sddmm import attention_aggregate, edge_scores
from graph_odenet_tpu.ops import pallas_gat as pg

HEADS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
FEAT = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DROP = float(sys.argv[3]) if len(sys.argv) > 3 else 0.6
N_NODES, N_EDGES = 169_343, 1_166_243
ITERS = 20


def timeit(name, fn, *args, iters=ITERS):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"phase": name, "ms": round(ms, 3)}), flush=True)
    return ms


def main():
    g = powerlaw_graph(N_NODES, N_EDGES, normalize=None)
    csr = prepare(g)
    rng = np.random.default_rng(1)
    s_src = jnp.asarray(rng.standard_normal((g.n_node_pad, HEADS)), jnp.float32)
    s_dst = jnp.asarray(rng.standard_normal((g.n_node_pad, HEADS)), jnp.float32)
    logits = edge_scores(g, s_src, s_dst)
    wh = jnp.asarray(
        rng.standard_normal((g.n_node_pad, HEADS, FEAT)), jnp.float32
    )
    gcot = jnp.asarray(
        rng.standard_normal((g.n_node_pad, HEADS, FEAT)), jnp.float32
    )
    key = jax.random.PRNGKey(7)
    seed = dm.seed_from_key(key)
    e_pad = csr.senders.shape[0]
    packed = HEADS * FEAT <= 128
    featp = 128 if packed else -(-FEAT // 128) * 128
    print(json.dumps(dict(
        heads=HEADS, feat=FEAT, dropout=DROP, n_edge=int(g.n_edge),
        e_pad=int(e_pad), packed=packed,
    )), flush=True)

    # --- end-to-end numbers (the bench's own measurement) ---
    def full(lg, w):
        return jax.grad(
            lambda lg, w: 0.5 * jnp.sum(attention_aggregate(
                csr, lg, w, scores=(s_src, s_dst),
                edge_dropout_rng=key, edge_dropout_rate=DROP,
            ) ** 2),
            argnums=(0, 1),
        )(lg, w)

    t_full = timeit("fwd+bwd total", jax.jit(full), logits, wh)

    def fwd_only(lg, w):
        return attention_aggregate(
            csr, lg, w, scores=(s_src, s_dst),
            edge_dropout_rng=key, edge_dropout_rate=DROP,
        )

    t_fwd = timeit("fwd only", jax.jit(fwd_only), logits, wh)
    t_vals = timeit(
        "glue _vals_edge_major (sender gather)",
        jax.jit(lambda w: pg._vals_edge_major(csr, w, packed, featp)), wh,
    )

    # --- backward pieces ---
    drop = None if DROP == 0.0 else (seed, DROP)
    res = jax.jit(
        lambda lg, w: pg._fwd_impl(csr, lg, w, drop=drop)
    )(logits, wh)
    out, m, l, logits3d, vals = res
    res7 = (logits, wh, out, m, l, logits3d, vals)

    t_bwd = timeit(
        "bwd _bwd_fused total",
        jax.jit(lambda gc: pg._bwd_fused(
            csr, res7, gc, None, scores=(s_src, s_dst, 0.2), drop=drop,
        )), gcot,
    )

    scores_ml = (s_src, s_dst, m, l, 0.2)
    if pg._use_recompute(HEADS, FEAT, scores_ml, with_dropout=drop is not None):
        t_dwh = timeit(
            "bwd dWh recompute pass",
            jax.jit(lambda gc: pg._dwh_csc_recompute(
                csr, gc, HEADS, FEAT, scores_ml, dropout=drop,
            )), gcot,
        )
    else:
        t_dwh = float("nan")

    print(json.dumps(dict(
        phase="summary",
        total_ms=round(t_full, 2), fwd_ms=round(t_fwd, 2),
        bwd_ms=round(t_full - t_fwd, 2), bwd_alone_ms=round(t_bwd, 2),
        dwh_ms=round(t_dwh, 2), vals_gather_ms=round(t_vals, 2),
        edges_per_s=round(g.n_edge / (t_full / 1e3)),
    )), flush=True)


if __name__ == "__main__":
    main()
