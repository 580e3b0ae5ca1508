"""Round-3 experiment: where is the SpMM headroom against the ~530 GB/s
cross-checked HBM ceiling (artifacts/roofline.json)?

Probes, all at arxiv scale on the real chip:
  G0  take, senders in CSR (receiver-sorted) order        — current fwd gather
  G1  take, senders sorted within each 128-receiver block — locality candidate
  G2  take, senders fully sorted                          — gather lower bound
  M0  current reduce kernel (8 unrolled K=128 dots/chunk)
  M1  GODE_SPMM_WIDE=1 (concat masks -> one K=1024 dot)   — re-measure r2's A/B

Run:  python scripts/exp_spmm_headroom.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_odenet_tpu.bench import powerlaw_graph  # noqa: E402
from graph_odenet_tpu.ops import pallas_spmm  # noqa: E402
from graph_odenet_tpu.ops.pallas_spmm import _segment_reduce, prepare  # noqa: E402


def t(fn, *a, iters=10):
    o = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n_nodes, n_edges, feat = 169_343, 1_166_243, 128
    g = powerlaw_graph(n_nodes, n_edges)
    csr = prepare(g)
    E, N = csr.senders.shape[0], csr.n_node_pad
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, feat)), jnp.float32)
    msgs = jnp.asarray(rng.standard_normal((E, feat)), jnp.float32)
    gb = 2 * E * feat * 4 / 1e9

    take = jax.jit(lambda tbl, idx: jnp.take(tbl, idx, axis=0))

    s_np = np.asarray(csr.senders)
    r_np = np.asarray(csr.receivers)
    # G1: stable-sort senders within each receiver 128-block.
    order = np.lexsort((s_np, r_np // 128))
    s_blk = jnp.asarray(s_np[order])
    s_sorted = jnp.asarray(np.sort(s_np))

    ms = t(take, x, csr.senders)
    print(f"G0 take CSR-order      {ms:7.3f} ms  {gb/ms*1e3:6.1f} GB/s")
    ms = t(take, x, s_blk)
    print(f"G1 take block-sorted   {ms:7.3f} ms  {gb/ms*1e3:6.1f} GB/s")
    ms = t(take, x, s_sorted)
    print(f"G2 take fully-sorted   {ms:7.3f} ms  {gb/ms*1e3:6.1f} GB/s")

    red = jax.jit(
        lambda m: _segment_reduce(m, csr.rel, csr.blk_ptr, csr.n_blocks)
    )
    ms = t(red, msgs)
    print(f"M0 reduce (mode={pallas_spmm._MODE}, wide={pallas_spmm._WIDE}) "
          f"{ms:7.3f} ms  bound {E*feat*4/530e9*1e3:.2f} ms")


if __name__ == "__main__":
    main()
