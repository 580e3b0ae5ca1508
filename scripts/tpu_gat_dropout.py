import time
import numpy as np
import jax, jax.numpy as jnp
from graph_odenet_tpu.graph import from_edges
from graph_odenet_tpu.ops.pallas_spmm import prepare
from graph_odenet_tpu.ops.pallas_gat import gat_aggregate_pallas_dropout
from graph_odenet_tpu.ops.segment import gather, segment_softmax, segment_sum

rng = np.random.default_rng(0)
n, e = 20_000, 150_000
src = rng.integers(0, n, e); dst = rng.zipf(1.8, e).astype(np.int64) % n
g = from_edges(src, dst, n_node=n, normalize=None, node_multiple=128, edge_multiple=1024)
csr = prepare(g)
for heads, feat in [(2, 16), (2, 128)]:
    logits = jnp.asarray(rng.standard_normal((g.n_edge_pad, heads)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((g.n_node_pad, heads, feat)), jnp.float32)
    keep = rng.random((g.n_edge_pad, heads)) > 0.4
    dmask = jnp.asarray(keep / 0.6, jnp.float32)
    def ref(lg, w):
        mask = g.edge_mask()[:, None]
        alpha = segment_softmax(lg, g.receivers, g.n_node_pad, mask=mask) * dmask
        return segment_sum(gather(w, g.senders) * alpha[..., None], g.receivers, num_segments=g.n_node_pad)
    f = jax.jit(lambda lg, w: gat_aggregate_pallas_dropout(csr, lg, w, dmask))
    err = float(jnp.max(jnp.abs(f(logits, wh) - ref(logits, wh))))
    gp = jax.jit(jax.grad(lambda lg, w: jnp.sum(jnp.sin(gat_aggregate_pallas_dropout(csr, lg, w, dmask))), argnums=(0,1)))(logits, wh)
    gr = jax.grad(lambda lg, w: jnp.sum(jnp.sin(ref(lg, w))), argnums=(0,1))(logits, wh)
    edl = float(jnp.max(jnp.abs(gp[0]-gr[0]))); edw = float(jnp.max(jnp.abs(gp[1]-gr[1])))
    print(f"H={heads} F={feat}: fwd err {err:.2e}, dlogits err {edl:.2e}, dwh err {edw:.2e}")
