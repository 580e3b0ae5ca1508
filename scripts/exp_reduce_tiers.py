"""Prove (or break) the f32-exact segment-reduce floor (round-3 VERDICT
#7): time the schedule-driven reduce at the three precision tiers in one
process each — if the time is affine in the MXU pass count (3 at highest,
2 at bf16x2, 1 at default) and the 1-pass intercept sits at the stream
bound, the 4.2-vs-1.4 ms gap IS the mantissa-split issue latency, not a
schedule defect.

Usage: for p in default bf16x2 highest; do GODE_PRECISION=$p python
scripts/exp_reduce_tiers.py; done   (run on the TPU)
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
from graph_odenet_tpu.ops.pallas_spmm import _MODE, prepare, segment_reduce_csr


def main():
    g = powerlaw_graph(169_343, 1_166_243)
    csr = prepare(g)
    rng = np.random.default_rng(0)
    msgs = jnp.asarray(
        rng.standard_normal((csr.senders.shape[0], 128)), jnp.float32
    )

    fn = jax.jit(lambda m: segment_reduce_csr(csr, m, transpose=True))
    out = jax.block_until_ready(fn(msgs))
    out = jax.block_until_ready(fn(msgs))
    t0 = time.perf_counter()
    iters = 30
    for _ in range(iters):
        out = fn(msgs)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    passes = {"highest": 3, "bf16x2": 2, "default": 1}[_MODE]
    print(json.dumps(dict(
        precision=_MODE, passes=passes, reduce_ms=round(ms, 3),
        n_edge=int(g.n_edge),
    )), flush=True)


if __name__ == "__main__":
    main()
