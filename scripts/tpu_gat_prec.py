import os, time
import numpy as np
import jax
import jax.numpy as jnp
from graph_odenet_tpu.bench import powerlaw_graph
from graph_odenet_tpu.ops.pallas_spmm import prepare, _MODE
from graph_odenet_tpu.ops.pallas_gat import gat_aggregate_pallas
from graph_odenet_tpu.ops.sddmm import attention_aggregate

g = powerlaw_graph(169_343, 1_166_243, normalize=None)
csr = prepare(g)
rng = np.random.default_rng(1)
for heads, feat in [(1, 128), (8, 8)]:
    logits = jnp.asarray(rng.standard_normal((g.n_edge_pad, heads)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((g.n_node_pad, heads, feat)), jnp.float32)
    fwd = jax.jit(lambda lg, w: gat_aggregate_pallas(csr, lg, w))
    fb = jax.jit(jax.grad(lambda lg, w: 0.5*jnp.sum(gat_aggregate_pallas(csr, lg, w)**2), argnums=(0,1)))
    ref = jax.jit(lambda lg, w: attention_aggregate(g, lg, w))(logits, wh)
    got = fwd(logits, wh)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    def t(fn, iters=10):
        o = fn(logits, wh); jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(iters): o = fn(logits, wh)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0)/iters*1e3
    tf, tfb = t(fwd), t(fb)
    print(f"mode={_MODE} H={heads} F={feat}: fwd {tf:.1f} ms ({g.n_edge/tf*1e3/1e6:.1f} M e/s), "
          f"fwd+bwd {tfb:.1f} ms ({g.n_edge/tfb*1e3/1e6:.1f} M e/s), rel_err={err:.1e}")
