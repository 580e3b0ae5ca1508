"""Plotting utilities (reference R11 matplotlib output parity)."""

import numpy as np


def test_plot_trajectories_and_mse(tmp_path):
    from graph_odenet_tpu.utils.plots import (
        plot_rollout_mse, plot_trajectories, plot_training_curve,
    )

    rng = np.random.default_rng(0)
    traj = rng.standard_normal((20, 4, 5)).cumsum(axis=0)
    p1 = tmp_path / "traj.png"
    plot_trajectories(traj, traj + 0.05, dim=2, path=str(p1))
    assert p1.stat().st_size > 1000

    p2 = tmp_path / "mse.png"
    plot_rollout_mse(np.abs(rng.standard_normal((2, 30))), labels=["a", "b"], path=str(p2))
    assert p2.stat().st_size > 1000

    p3 = tmp_path / "curve.png"
    plot_training_curve([{"loss": 1 / (i + 1)} for i in range(10)], path=str(p3))
    assert p3.stat().st_size > 1000
