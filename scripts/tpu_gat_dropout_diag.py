import numpy as np
import jax, jax.numpy as jnp
from graph_odenet_tpu.graph import from_edges
from graph_odenet_tpu.ops.pallas_spmm import prepare
from graph_odenet_tpu.ops.pallas_gat import gat_aggregate_pallas_dropout, gat_aggregate_pallas
from graph_odenet_tpu.ops.segment import gather, segment_softmax, segment_sum

rng = np.random.default_rng(0)
n, e = 20_000, 150_000
src = rng.integers(0, n, e); dst = rng.zipf(1.8, e).astype(np.int64) % n
g = from_edges(src, dst, n_node=n, normalize=None, node_multiple=128, edge_multiple=1024)
csr = prepare(g)
heads, feat = 2, 16
logits = jnp.asarray(rng.standard_normal((g.n_edge_pad, heads)), jnp.float32)
wh = jnp.asarray(rng.standard_normal((g.n_node_pad, heads, feat)), jnp.float32)
for tag, dm in [("ones", np.ones((g.n_edge_pad, heads))),
                ("drop", (rng.random((g.n_edge_pad, heads)) > 0.4) / 0.6)]:
    dmask = jnp.asarray(dm, jnp.float32)
    def ref(lg, w):
        mask = g.edge_mask()[:, None]
        alpha = segment_softmax(lg, g.receivers, g.n_node_pad, mask=mask) * dmask
        return segment_sum(gather(w, g.senders) * alpha[..., None], g.receivers, num_segments=g.n_node_pad)
    gp = jax.jit(jax.grad(lambda lg, w: jnp.sum(jnp.sin(gat_aggregate_pallas_dropout(csr, lg, w, dmask))), argnums=(0,1)))(logits, wh)
    gr = jax.jit(jax.grad(lambda lg, w: jnp.sum(jnp.sin(ref(lg, w))), argnums=(0,1)))(logits, wh)
    d = np.abs(np.asarray(gp[1]) - np.asarray(gr[1]))
    mag = np.abs(np.asarray(gr[1]))
    idx = np.unravel_index(d.argmax(), d.shape)
    print(f"{tag}: dwh max abs err {d.max():.2e} at {idx} (ref val {mag[idx]:.3f}), "
          f"rel@max {(d.max()/max(mag[idx],1e-9)):.2e}, n_err>1e-3: {(d>1e-3).sum()}")
