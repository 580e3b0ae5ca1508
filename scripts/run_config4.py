"""Config 4 end-to-end: a completed training run of the edge-partitioned
GCN-ODE (the full R7 recipe, dropout live) over the 8-virtual-device CPU
mesh on synthetic ogbn-arxiv, at the largest scale the mesh sustains
(round-2 VERDICT #3).  Writes artifacts/config4_run.json.

Round-5 knobs: GODE_MODE=ring|ring_pallas (halo flavour — ring_pallas is
the kernel tier, VERDICT r4 #2), GODE_MODEL=gcnode|gatode,
GODE_CALIBRATED=1 (difficulty-calibrated twin, VERDICT r4 #4),
GODE_TAG=<suffix> for the artifact name.

Usage: GODE_SCALE=0.25 python scripts/run_config4.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# sitecustomize registers the tunneled TPU before we run; config updates
# (before any jax.devices() call) still win — env vars do not.
# GODE_TPU=1 keeps the real chip (single-device mesh) for the TPU
# step-time contrast row; default is the 8-virtual-device CPU mesh.
ON_TPU = os.environ.get("GODE_TPU", "0") == "1"
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

SCALE = float(os.environ.get("GODE_SCALE", "0.25"))
EPOCHS = int(os.environ.get("GODE_EPOCHS", "30"))
MODE = os.environ.get("GODE_MODE", "")
MODEL = os.environ.get("GODE_MODEL", "")
CALIBRATED = os.environ.get("GODE_CALIBRATED", "0") == "1"
REMAT = os.environ.get("GODE_REMAT", "0") == "1"
TAG = os.environ.get("GODE_TAG", "")


def main():
    from graph_odenet_tpu.configs import get_config
    from graph_odenet_tpu.data.ogbn import synthetic_ogbn_arxiv
    from graph_odenet_tpu.parallel.trainer import (
        ShardedTrainConfig,
        fit_sharded_node_classifier,
    )

    _, cfg = get_config(4)
    t0 = time.time()
    data = synthetic_ogbn_arxiv(seed=0, scale=SCALE, calibrated=CALIBRATED)
    model = MODEL or cfg.model
    tcfg = ShardedTrainConfig(
        model=model, hidden=cfg.hidden if model == "gcnode" else 64,
        heads=4, steps=cfg.steps, t1=cfg.t1,
        lr=cfg.lr, weight_decay=cfg.weight_decay, epochs=EPOCHS,
        patience=cfg.patience, mode=MODE or cfg.mode, remat=REMAT,
        dropout=cfg.dropout if model == "gcnode" else 0.6,
        n_parts=min(cfg.n_parts, len(jax.devices())),
    )
    res = fit_sharded_node_classifier(tcfg, data)
    res.pop("params", None)
    res.update(config="ogbn-arxiv-gcnode-sharded", dataset=data.name)
    res["scale"] = SCALE
    res["epochs"] = EPOCHS
    res["mode"] = tcfg.mode
    res["model"] = model
    res["calibrated"] = CALIBRATED
    res["platform"] = jax.default_backend()
    res["wall_seconds"] = round(time.time() - t0, 1)
    os.makedirs("artifacts", exist_ok=True)
    base = "config4_tpu_contrast" if ON_TPU else "config4_run"
    path = f"artifacts/{base}{('_' + TAG) if TAG else ''}.json"
    with open(path, "w") as f:
        json.dump(res, f, indent=1, default=float)
    print(json.dumps(res, default=float), flush=True)


if __name__ == "__main__":
    main()
