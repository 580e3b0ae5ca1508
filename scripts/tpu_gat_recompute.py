"""A/B the recompute-α GAT backward vs the permuted-α path on the TPU.

Usage: python scripts/tpu_gat_recompute.py [heads feat [iters]]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_odenet_tpu.bench import gat_bench

heads = int(sys.argv[1]) if len(sys.argv) > 1 else 8
feat = int(sys.argv[2]) if len(sys.argv) > 2 else 8
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

for dwh in ["auto", "permute"]:
    os.environ["GODE_GAT_DWH"] = dwh
    r = gat_bench(heads=heads, feat=feat, iters=iters, use_scores=True)
    print(json.dumps({
        "dwh": dwh,
        **{k: round(v, 2) if isinstance(v, float) else v for k, v in r.items()},
    }), flush=True)
