"""Config 3 end-to-end: train discrete IN + IN-ODE on the spring n-body
system and record the rollout-MSE-vs-horizon curves — the reference's
physics deliverable (SURVEY.md §2 R11, round-2 VERDICT #3).

Writes artifacts/physics_rollout.json and artifacts/physics_rollout.png.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# sitecustomize registers the tunneled TPU before we run; config updates
# (before any jax.devices() call) still win — env vars do not.
if os.environ.get("GODE_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

import jax.numpy as jnp

from graph_odenet_tpu.configs import get_config
from graph_odenet_tpu.data.nbody import generate_trajectories
from graph_odenet_tpu.models import INODE
from graph_odenet_tpu.train.physics import (
    fit_inode,
    fit_interaction_network,
    rollout_discrete,
    rollout_mse,
)
from graph_odenet_tpu.utils.plots import plot_rollout_mse

HORIZON = int(os.environ.get("GODE_HORIZON", "50"))
N_TEST = int(os.environ.get("GODE_NTEST", "64"))


def main():
    _, cfg = get_config(3)
    # Smoke-scale overrides for time-boxed runs (full config is default).
    if os.environ.get("GODE_EPOCHS"):
        cfg = dataclasses.replace(cfg, epochs=int(os.environ["GODE_EPOCHS"]))
    if os.environ.get("GODE_NSIMS"):
        cfg = dataclasses.replace(cfg, n_sims=int(os.environ["GODE_NSIMS"]))
    t0 = time.time()

    # Shared training data (config seed) + held-out test trajectories.
    key = jax.random.PRNGKey(cfg.seed)
    key, dkey, tkey = jax.random.split(key, 3)
    from graph_odenet_tpu.train.physics import _make_data

    system, trajs = _make_data(cfg, dkey)
    test_trajs = generate_trajectories(system, tkey, N_TEST, HORIZON + 1)

    print("training discrete IN...", flush=True)
    res_in = fit_interaction_network(cfg, trajs=trajs, system=system)
    print(
        f"  one_step_mse={res_in['one_step_mse']:.3e}"
        f" ({res_in['seconds']:.0f}s)",
        flush=True,
    )

    print("training IN-ODE...", flush=True)
    res_ode = fit_inode(cfg, trajs=trajs, system=system)
    print(
        f"  window_mse={res_ode['window_mse']:.3e}"
        f" ({res_ode['seconds']:.0f}s)",
        flush=True,
    )

    init = test_trajs[:, 0]  # [B, N, 1+2D]

    # Discrete IN: autoregressive feedback rollout.
    pred_disc = rollout_discrete(
        res_in["forward"], res_in["params"], system, init, HORIZON
    )
    mse_disc = rollout_mse(pred_disc, test_trajs[:, : HORIZON + 1])

    # IN-ODE: one long integration over the horizon grid (same params,
    # larger scan budget so dopri5 can resolve the longer span).
    model = res_ode["model"]
    long_model = INODE(
        dim=model.dim,
        effect_dim=model.effect_dim,
        relation_hidden=model.relation_hidden,
        object_hidden=model.object_hidden,
        method=model.method,
        rtol=model.rtol,
        atol=model.atol,
        steps=max(model.steps * (HORIZON // cfg.ode_window + 1), 64),
    )
    ts = jnp.arange(HORIZON + 1, dtype=jnp.float32) * system.dt
    senders, receivers = system.edges()

    @jax.jit
    def ode_roll(params, init):
        def one(w0):
            y = long_model.apply(
                {"params": params}, w0[..., 1:], ts, w0[..., :1],
                senders, receivers,
            )  # [T, N, 2D]
            mass = jnp.broadcast_to(
                w0[None, :, :1], (y.shape[0],) + w0[..., :1].shape
            )
            return jnp.concatenate([mass, y], axis=-1)

        return jax.vmap(one)(init)

    pred_ode = ode_roll(res_ode["params"], init)
    mse_ode = rollout_mse(pred_ode, test_trajs[:, : HORIZON + 1])

    out = dict(
        config="physics-in-ode",
        horizon=HORIZON,
        n_test=N_TEST,
        dt=float(system.dt),
        one_step_mse=res_in["one_step_mse"],
        window_mse=res_ode["window_mse"],
        train_seconds_in=round(res_in["seconds"], 1),
        train_seconds_inode=round(res_ode["seconds"], 1),
        rollout_mse_discrete=[float(x) for x in mse_disc],
        rollout_mse_inode=[float(x) for x in mse_ode],
        cfg=dataclasses.asdict(cfg),
        total_seconds=round(time.time() - t0, 1),
    )
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/physics_rollout.json", "w") as f:
        json.dump(out, f, indent=1)
    plot_rollout_mse(
        [mse_disc, mse_ode],
        labels=["discrete IN", "IN-ODE"],
        path="artifacts/physics_rollout.png",
    )
    for h in (1, 5, 10, 20, 50):
        if h <= HORIZON:
            print(
                f"h={h:3d}  discrete={float(mse_disc[h]):.4e}"
                f"  inode={float(mse_ode[h]):.4e}",
                flush=True,
            )
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, (list, dict))}))


if __name__ == "__main__":
    main()
