"""TPU smoke: GAT training on the Pallas representation (fused fwd+bwd+dropout)."""
import time
from graph_odenet_tpu.data import synthetic_planetoid
from graph_odenet_tpu.train import NodeClassConfig, fit_node_classifier

t0 = time.time()
data = synthetic_planetoid("cora", seed=0, scale=0.5)
for rep in ("pallas", "segment"):
    cfg = NodeClassConfig(model="gat", epochs=20, patience=20,
                          representation=rep, echo=False)
    res = fit_node_classifier(cfg, data)
    print(f"{rep}: test_acc={res['best']['test_acc']:.3f} "
          f"wall={res['seconds']:.1f}s")
print("total", time.time() - t0)
