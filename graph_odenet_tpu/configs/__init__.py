"""Canonical experiment configs — one per BASELINE.json ``configs`` entry.

  0  2-layer GCN on Cora (discrete baseline, full-batch, CPU-runnable)
  1  GCN-ODE on Cora, fixed-step RK4 (4 steps)
  2  GAT-ODE on Citeseer with adaptive dopri5 (SDDMM attention)
  3  Interaction-network ODE on n-body springs, rollout MSE
  4  Edge-partitioned GCN-ODE on OGBN-arxiv, multi-device halo exchange

Each entry returns (kind, config) where kind selects the trainer:
``node`` → train.node_classification, ``physics`` → train.physics,
``sharded`` → parallel.sharded_gcn.
"""

from __future__ import annotations

import dataclasses

from graph_odenet_tpu.train.node_classification import NodeClassConfig
from graph_odenet_tpu.train.physics import PhysicsConfig

__all__ = ["get_config", "CONFIG_NAMES"]

CONFIG_NAMES = {
    0: "cora-gcn-discrete",
    1: "cora-gcnode-rk4",
    2: "citeseer-gatode-dopri5",
    3: "nbody-inode-rollout",
    4: "ogbn-arxiv-gcnode-sharded",
}


@dataclasses.dataclass
class ShardedConfig:
    dataset: str = "ogbn-arxiv"
    hidden: int = 256
    steps: int = 4
    t1: float = 1.0
    lr: float = 0.01
    epochs: int = 30
    mode: str = "ring"   # halo exchange flavour
    n_parts: int = 8


def get_config(i: int):
    if i == 0:
        return "node", NodeClassConfig(
            model="gcn", hidden=16, dropout=0.5, lr=0.01,
            weight_decay=5e-4, epochs=200, patience=100,
        )
    if i == 1:
        return "node", NodeClassConfig(
            model="gcnode", hidden=16, method="rk4", steps=4,
            dropout=0.5, lr=0.01, weight_decay=5e-4, epochs=200,
        )
    if i == 2:
        return "node", NodeClassConfig(
            model="gatode", hidden=8, heads=8, method="dopri5_scan",
            steps=32, rtol=1e-3, atol=1e-4, dropout=0.6,
            lr=0.005, weight_decay=5e-4, epochs=300, patience=100,
        )
    if i == 3:
        return "physics", PhysicsConfig(
            n_bodies=6, n_sims=256, n_steps=200,
            ode_method="dopri5_scan", ode_steps=16, ode_window=10,
        )
    if i == 4:
        return "sharded", ShardedConfig()
    raise KeyError(i)
