import json
from graph_odenet_tpu.bench import spmm_bench
r = spmm_bench(iters=15)
print(json.dumps({k: round(v,1) if isinstance(v,float) else v for k,v in r.items()}))
