"""Full-batch node-classification trainer (SURVEY.md §2 R7, §3.1).

Parity with the reference ``train.py``: Adam(lr 0.01, weight-decay 5e-4 as
L2-in-gradient), full-graph forward, NLL on the train indices, early
stopping on validation loss (GAT patience ~100), final test accuracy, seed
control.  TPU deltas: the epoch step is one jitted function (forward +
backward + update all on device), GCN-family models aggregate through the
densified Â on the MXU for Cora-scale graphs, and metrics stream as JSONL.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import optax

from graph_odenet_tpu.data.planetoid import NodeClassificationData
from graph_odenet_tpu.models import GAT, GCN, GATODE, GCNODE, ResGAT, ResGCN
from graph_odenet_tpu.utils.logging import MetricsLogger
from graph_odenet_tpu.utils.metrics import masked_accuracy, masked_nll

__all__ = ["NodeClassConfig", "build_model", "fit_node_classifier"]


@dataclasses.dataclass
class NodeClassConfig:
    model: str = "gcn"           # gcn|resgcn|gcnode|gat|resgat|gatode
    hidden: int = 16
    heads: int = 8
    n_blocks: int = 2            # residual variants
    dropout: float = 0.5
    # ODE-variant knobs.
    t1: float = 1.0
    method: str = "rk4"
    steps: int = 4
    rtol: float = 1e-3
    atol: float = 1e-4
    adjoint: Union[bool, str] = False  # False | True | "checkpoint"
    activation: str = "tanh"
    # Optimisation (reference defaults).
    lr: float = 0.01
    weight_decay: float = 5e-4
    epochs: int = 200
    patience: int = 100
    seed: int = 42
    # Aggregation path: dense Â on the MXU (GCN family only).
    dense_adj: bool = True
    # Explicit adjacency representation override: "dense" | "segment" |
    # "pallas" (CSR-tile Pallas kernels — TPU only).  None → the dense_adj
    # auto rule above.
    representation: Optional[str] = None
    log_path: Optional[str] = None
    echo: bool = False


def build_model(cfg: NodeClassConfig, n_class: int):
    common = dict(n_class=n_class, dropout=cfg.dropout)
    ode = dict(
        t1=cfg.t1, method=cfg.method, steps=cfg.steps,
        rtol=cfg.rtol, atol=cfg.atol, adjoint=cfg.adjoint,
        activation=cfg.activation,
    )
    if cfg.model == "gcn":
        return GCN(hidden=cfg.hidden, **common)
    if cfg.model == "resgcn":
        return ResGCN(hidden=cfg.hidden, n_blocks=cfg.n_blocks, **common)
    if cfg.model == "gcnode":
        return GCNODE(hidden=cfg.hidden, **common, **ode)
    if cfg.model == "gat":
        return GAT(hidden=cfg.hidden, heads=cfg.heads, **common)
    if cfg.model == "resgat":
        return ResGAT(hidden=cfg.hidden, heads=cfg.heads, n_blocks=cfg.n_blocks, **common)
    if cfg.model == "gatode":
        return GATODE(hidden=cfg.hidden, heads=cfg.heads, **common, **ode)
    raise ValueError(f"unknown model {cfg.model!r}")


def choose_representation(graph, model: str) -> str:
    """Scale-aware adjacency-representation dispatch (measured, TPU v5e):

      * GCN family at ≤16K nodes → dense Â on the MXU (N² f32 ≤ 1 GB is
        wasteful in memory but a single fused matmul wins on wall-clock at
        Cora/Citeseer scale);
      * larger graphs (or any scale on non-TPU backends where the Pallas
        kernels run interpreted) → CSR-tile Pallas kernels on TPU, segment
        ops elsewhere.

    GAT-family models take the Pallas edge-list path on TPU at every scale
    (measured: fused kernels win 2.5× at Cora scale and 1.8× at arxiv
    scale over the segment path) and segment ops elsewhere.
    """
    import jax

    on_tpu = jax.default_backend() == "tpu"
    is_gcn_family = model in ("gcn", "resgcn", "gcnode")
    if not is_gcn_family:
        return "pallas" if on_tpu else "segment"
    if graph.n_node_pad <= 16_384:
        return "dense"
    return "pallas" if on_tpu else "segment"


def fit_node_classifier(cfg: NodeClassConfig, data: NodeClassificationData):
    """Train + early-stop + test.  Returns a results dict."""
    model = build_model(cfg, data.n_class)
    is_gcn_family = cfg.model in ("gcn", "resgcn", "gcnode")
    representation = cfg.representation
    if representation is None:
        representation = (
            choose_representation(data.graph, cfg.model)
            if cfg.dense_adj
            else "segment"
        )
    if representation == "dense":
        adj = data.dense_adj()
    elif representation == "segment":
        adj = data.graph
    elif representation == "pallas":
        from graph_odenet_tpu.ops.pallas_spmm import prepare

        adj = prepare(data.graph)
    else:
        raise ValueError(f"unknown representation {representation!r}")

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init(
        {"params": init_rng}, adj, data.features, deterministic=True
    )["params"]

    # Reference: torch Adam(weight_decay) = L2 added to gradients.
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.adam(cfg.lr),
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, dropout_rng):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, adj, data.features,
                deterministic=False, rngs={"dropout": dropout_rng},
            )
            return masked_nll(out, data.labels, data.idx_train)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params):
        out = model.apply({"params": params}, adj, data.features, deterministic=True)
        return dict(
            train_acc=masked_accuracy(out, data.labels, data.idx_train),
            val_loss=masked_nll(out, data.labels, data.idx_val),
            val_acc=masked_accuracy(out, data.labels, data.idx_val),
            test_acc=masked_accuracy(out, data.labels, data.idx_test),
        )

    log = MetricsLogger(cfg.log_path, echo=cfg.echo)
    best = dict(val_loss=float("inf"), test_acc=0.0, val_acc=0.0, epoch=-1)
    best_params = params
    bad_epochs = 0
    t_start = time.time()
    for epoch in range(cfg.epochs):
        rng, drop_rng = jax.random.split(rng)
        params, opt_state, loss = train_step(params, opt_state, drop_rng)
        m = eval_step(params)
        log.write(epoch=epoch, loss=loss, **m)
        if float(m["val_loss"]) < best["val_loss"]:
            best = dict(
                val_loss=float(m["val_loss"]),
                val_acc=float(m["val_acc"]),
                test_acc=float(m["test_acc"]),
                epoch=epoch,
            )
            best_params = params
            bad_epochs = 0
        else:
            bad_epochs += 1
            if bad_epochs > cfg.patience:
                break
    log.close()
    return dict(
        best=best,
        params=best_params,
        epochs_run=epoch + 1,
        seconds=time.time() - t_start,
        final_test_acc=best["test_acc"],
    )
