"""TPU smoke: fused GAT backward vs XLA backward, correctness + timing."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from graph_odenet_tpu.graph import from_edges
from graph_odenet_tpu.ops import pallas_gat
from graph_odenet_tpu.ops.pallas_spmm import prepare

print("backend:", jax.default_backend(), jax.devices())

rng = np.random.default_rng(0)
n, e = 20_000, 150_000
src = rng.integers(0, n, e)
dst = (rng.zipf(1.8, e).astype(np.int64)) % n
g = from_edges(src, dst, n_node=n, normalize=None, node_multiple=128,
               edge_multiple=1024)
csr = prepare(g)

for heads, feat in [(1, 128), (8, 8), (2, 128)]:
    logits = jnp.asarray(rng.standard_normal((g.n_edge_pad, heads)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((g.n_node_pad, heads, feat)), jnp.float32)
    out, res = pallas_gat._gat_fwd(csr, logits, wh)
    gg = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)
    f = jax.jit(lambda gg: pallas_gat._bwd_fused(csr, res, gg))
    x = jax.jit(lambda gg: pallas_gat._bwd_xla(csr, res, gg))
    df, dxf = jax.block_until_ready(f(gg))
    dx, dxx = jax.block_until_ready(x(gg))
    err_dl = float(jnp.max(jnp.abs(df - dx)))
    err_dw = float(jnp.max(jnp.abs(dxf - dxx)))
    def t(fn):
        fn(gg); jax.block_until_ready(fn(gg))
        t0 = time.perf_counter()
        for _ in range(10):
            o = fn(gg)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / 10
    tf, tx = t(f), t(x)
    print(f"H={heads} F={feat}: err dl={err_dl:.2e} dwh={err_dw:.2e}  "
          f"fused {tf*1e3:.2f} ms ({g.n_edge/tf/1e6:.1f} M e/s)  "
          f"xla {tx*1e3:.2f} ms ({g.n_edge/tx/1e6:.1f} M e/s)  "
          f"speedup {tx/tf:.2f}x")
