"""Throughput + accuracy across GODE_PRECISION tiers (set via env per run)."""
import os, time
import numpy as np
import jax
import jax.numpy as jnp
from graph_odenet_tpu.bench import powerlaw_graph
from graph_odenet_tpu.ops.spmm import spmm_segment
from graph_odenet_tpu.ops.pallas_spmm import prepare, spmm_pallas, _MODE

g = powerlaw_graph(169_343, 1_166_243)
csr = prepare(g)
x = jnp.asarray(np.random.default_rng(1).standard_normal((g.n_node_pad, 128)), jnp.float32)

def t(fn, *a, iters=15):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3

fb = jax.jit(jax.grad(lambda x: 0.5*jnp.sum(spmm_pallas(csr, x)**2)))
fwd = jax.jit(lambda x: spmm_pallas(csr, x))
ref = jax.jit(lambda x: spmm_segment(g, x))(x)
got = fwd(x)
rel_err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
tf, tfb = t(fwd, x), t(fb, x)
print(f"mode={_MODE}: fwd {tf:.2f} ms, fwd+bwd {tfb:.2f} ms "
      f"({g.n_edge/(tfb/1e3)/1e6:.1f} M e/s), rel_err={rel_err:.2e}")
