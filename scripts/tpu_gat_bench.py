import os, json
from graph_odenet_tpu.bench import gat_bench

for heads, feat in [(1, 128), (8, 8)]:
    for bwd in ["fused", "xla"]:
        os.environ["GODE_GAT_BWD"] = bwd
        r = gat_bench(heads=heads, feat=feat, iters=10)
        print(json.dumps({"bwd": bwd, **{k: round(v, 2) if isinstance(v, float) else v for k, v in r.items()}}))
