"""Calibrate synthetic-twin difficulty (data/planetoid.CALIBRATED).

Sweeps twin-generator knobs and trains the canonical 2-layer GCN (config-0
recipe) so the twin's test accuracy lands near the published real-data
number (Cora .815 / Citeseer .703 / Pubmed .790) — then the twins can
falsify ODE-vs-discrete accuracy claims instead of saturating (SURVEY.md
§6, round-1 VERDICT "what's missing" #1).

Usage: python scripts/calibrate_twins.py <dataset> [h=0.7] [cvf=0.6] [nw=14]
       (no args: coarse grid per dataset)
"""

import itertools
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

from graph_odenet_tpu.data import synthetic_planetoid  # noqa: E402
from graph_odenet_tpu.train import (  # noqa: E402
    NodeClassConfig, fit_node_classifier,
)

TARGET = {"cora": 0.815, "citeseer": 0.703, "pubmed": 0.790}


def run(name, h, cvf, nw, seeds=(0, 1)):
    accs = []
    for seed in seeds:
        data = synthetic_planetoid(
            name, seed=seed, homophily=h, class_vocab_frac=cvf,
            noise_words=nw,
        )
        cfg = NodeClassConfig(
            model="gcn", hidden=16, dropout=0.5, lr=0.01, weight_decay=5e-4,
            epochs=200, patience=100, seed=seed,
            representation="segment" if name == "pubmed" else None,
        )
        accs.append(fit_node_classifier(cfg, data)["best"]["test_acc"])
    mean = sum(accs) / len(accs)
    print(
        f"{name} h={h:.2f} cvf={cvf:.2f} nw={nw}: "
        f"acc={mean:.3f} (target {TARGET[name]:.3f}) {accs}",
        flush=True,
    )
    return mean


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in TARGET:
        name = sys.argv[1]
        h = float(sys.argv[2]) if len(sys.argv) > 2 else 0.7
        cvf = float(sys.argv[3]) if len(sys.argv) > 3 else 0.6
        nw = int(sys.argv[4]) if len(sys.argv) > 4 else 14
        run(name, h, cvf, nw)
    else:
        for name in ("cora", "citeseer", "pubmed"):
            for h, cvf, nw in itertools.product(
                (0.6, 0.75), (0.6, 0.8), (10, 18)
            ):
                run(name, h, cvf, nw, seeds=(0,))
