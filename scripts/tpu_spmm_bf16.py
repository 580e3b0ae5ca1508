import time
import numpy as np
import jax, jax.numpy as jnp
from graph_odenet_tpu.bench import powerlaw_graph
from graph_odenet_tpu.ops.spmm import spmm_segment
from graph_odenet_tpu.ops.pallas_spmm import prepare, spmm_pallas

g = powerlaw_graph(169_343, 1_166_243)
csr = prepare(g)
x32 = jnp.asarray(np.random.default_rng(1).standard_normal((g.n_node_pad, 128)), jnp.float32)
def t(fn, x, iters=15):
    o = fn(x); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = fn(x)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3
for dt, name in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
    x = x32.astype(dt)
    fb = jax.jit(jax.grad(lambda x: 0.5*jnp.sum(spmm_pallas(csr, x).astype(jnp.float32)**2)))
    ms = t(fb, x)
    ref = spmm_segment(g, x32)
    err = float(jnp.max(jnp.abs(spmm_pallas(csr, x).astype(jnp.float32) - ref)) / jnp.max(jnp.abs(ref)))
    print(f"{name}: fwd+bwd {ms:.2f} ms ({g.n_edge/(ms/1e3)/1e6:.1f} M e/s) rel_err {err:.1e}")
