"""Train-step perf pass at arxiv scale + solver comparison on real models
(round-3 VERDICT #4 and #6).

Measures `ode_model_bench` cells:
  * config-2's REAL training shape — steps=32 (round 3 quietly measured
    steps=8) — for GCN-ODE and GAT-ODE at arxiv scale;
  * remat'd direct backprop vs the O(1)-memory continuous adjoint
    (`ode/adjoint.py`) — the HBM-vs-FLOPs tradeoff SURVEY §2 T4 ships both
    sides of;
  * `adams` (VCABM) vs dopri5 on the real models at Cora and arxiv scale
    (eval + train_step) — does the NFE advantage survive real dynamics?

Appends one JSON line per cell to artifacts/trainstep_solvers.jsonl
(resumable; existing (model,scale,mode,method,remat,adjoint,steps) cells
are skipped).  Run on the TPU.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from graph_odenet_tpu.bench import ode_model_bench

OUT = "artifacts/trainstep_solvers.jsonl"

ARXIV = dict(n_nodes=169_343, deg=8)  # E≈2.88M after sym+loops (the
                                      # round-3 train-step rows' shape)
CORA = dict(n_nodes=2_708, deg=4)

CELLS = [
    # --- VERDICT #4: config-2 real shape (steps=32), remat vs adjoint ---
    dict(model="gcnode", scale="arxiv", mode="fwd", method="dopri5",
         steps=32),
    # steps=32 + remat OOMs: the bounded scan's per-step carry (y + FSAL f
    # + dense-output coeffs) needs 28.9 GB vs 15.75 HBM even with the
    # dynamics remat'd — artifacts/remat_steps32_oom.txt holds the XLA
    # report.  The adjoint is the at-scale steps=32 training path; remat
    # rows at steps=8 give the round-3-comparable crossover point.
    dict(model="gcnode", scale="arxiv", mode="train_step", method="dopri5",
         steps=8, remat=True),
    dict(model="gcnode", scale="arxiv", mode="train_step", method="dopri5",
         steps=32, adjoint=True),
    dict(model="gatode", scale="arxiv", mode="fwd", method="dopri5",
         steps=32),
    dict(model="gatode", scale="arxiv", mode="train_step", method="dopri5",
         steps=8, remat=True),
    dict(model="gatode", scale="arxiv", mode="train_step", method="dopri5",
         steps=32, adjoint=True),
    # Same-shape adjoint-vs-remat comparison at the steps=8 shape.
    dict(model="gcnode", scale="arxiv", mode="train_step", method="dopri5",
         steps=8, adjoint=True),
    dict(model="gatode", scale="arxiv", mode="train_step", method="dopri5",
         steps=8, adjoint=True),
    # --- round-5 VERDICT #3: checkpointed-forward adjoint (stored
    # accepted-step states, fixed anchored reverse sweep — no second
    # adaptive solve, no backward y drift) at the same shapes ---
    dict(model="gcnode", scale="arxiv", mode="train_step", method="dopri5",
         steps=32, adjoint="checkpoint"),
    dict(model="gatode", scale="arxiv", mode="train_step", method="dopri5",
         steps=32, adjoint="checkpoint"),
    dict(model="gcnode", scale="arxiv", mode="train_step", method="dopri5",
         steps=8, adjoint="checkpoint"),
    dict(model="gatode", scale="arxiv", mode="train_step", method="dopri5",
         steps=8, adjoint="checkpoint"),
    # --- VERDICT #6: adams (VCABM) on real models ---
    dict(model="gcnode", scale="cora", mode="fwd", method="adams"),
    dict(model="gcnode", scale="cora", mode="fwd", method="dopri5"),
    dict(model="gcnode", scale="cora", mode="train_step", method="adams",
         steps=32),
    dict(model="gcnode", scale="cora", mode="train_step", method="dopri5",
         steps=32),
    dict(model="gatode", scale="cora", mode="fwd", method="adams"),
    dict(model="gatode", scale="cora", mode="fwd", method="dopri5"),
    dict(model="gcnode", scale="arxiv", mode="fwd", method="adams"),
    dict(model="gatode", scale="arxiv", mode="fwd", method="adams"),
]


def main():
    os.makedirs("artifacts", exist_ok=True)
    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            r = json.loads(line)
            done.add((r["model"], r["scale"], r["mode"], r["method_req"],
                      r.get("remat", False), r.get("adjoint", False),
                      r.get("steps", 32)))
    for cell in CELLS:
        c = dict(cell)
        scale = c.pop("scale")
        key = (c["model"], scale, c["mode"], c["method"],
               c.get("remat", False), c.get("adjoint", False),
               c.get("steps", 32))
        if key in done:
            print(f"skip {key}", flush=True)
            continue
        shape = ARXIV if scale == "arxiv" else CORA
        kw = dict(shape)
        kw.update(c)
        kw.setdefault("iters", 5 if scale == "arxiv" else 10)
        method_req = c["method"]
        try:
            r = ode_model_bench(**kw)
        except Exception as e:  # OOM cells are data too
            r = dict(model=c["model"], mode=c["mode"], method=c["method"],
                     error=repr(e)[:300])
        r["scale"] = scale
        r["method_req"] = method_req
        with open(OUT, "a") as f:
            f.write(json.dumps(r, default=float) + "\n")
        print(json.dumps(r, default=float), flush=True)


if __name__ == "__main__":
    main()
