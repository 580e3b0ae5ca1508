import time
import numpy as np
import jax
import jax.numpy as jnp
from graph_odenet_tpu.bench import powerlaw_graph
from graph_odenet_tpu.ops.pallas_spmm import prepare, spmm_pallas, _segment_reduce

g = powerlaw_graph(169_343, 1_166_243)
csr = prepare(g)
x = jnp.asarray(np.random.default_rng(1).standard_normal((g.n_node_pad, 128)), jnp.float32)

def t(fn, *a, iters=15):
    fn(*a); o = fn(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3

gather = jax.jit(lambda x: jnp.take(x, csr.senders, axis=0) * csr.weight[:, None])
msgs = gather(x)
kern = jax.jit(lambda m: _segment_reduce(m, csr.rel, csr.blk_ptr, csr.n_blocks))
fwd = jax.jit(lambda x: spmm_pallas(csr, x))
fb = jax.jit(jax.grad(lambda x: 0.5*jnp.sum(spmm_pallas(csr, x)**2)))

print(f"gather+mul: {t(gather, x):.2f} ms")
print(f"kernel only: {t(kern, msgs):.2f} ms")
print(f"fwd total:  {t(fwd, x):.2f} ms")
print(f"fwd+bwd:    {t(fb, x):.2f} ms  ({g.n_edge/(t(fb,x)/1e3)/1e6:.1f} M e/s)")
