"""CLI surface (reference `python train.py --flags` parity, SURVEY.md §2 R7)."""

import contextlib
import io
import json

from graph_odenet_tpu.cli import main


def capture_json(fn, argv):
    """Run a CLI entry point, return its last stdout line parsed as JSON."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(argv)
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def test_cli_node(capsys):
    main([
        "node", "--model", "gcn", "--dataset", "cora", "--scale", "0.08",
        "--epochs", "40", "--patience", "40", "--quiet",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # CLI plumbing smoke: well above 7-class chance (~0.14); exact accuracy on
    # the tiny scale-0.08 twin graph varies with platform numerics.
    assert out["best"]["test_acc"] > 0.35
    assert out["epochs_run"] == 40


def test_cli_physics_rollout(capsys):
    main([
        "physics", "--n-sims", "12", "--n-steps", "20", "--epochs", "1",
        "--n-bodies", "4", "--rollout", "5",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "one_step_mse" in out and "rollout_mse" in out


def test_run_config_smoke():
    import dataclasses

    from graph_odenet_tpu.configs import get_config

    # config 0 dataclass plumbing (a direct full-epoch run would be slow)
    kind, cfg = get_config(0)
    assert kind == "node" and cfg.model == "gcn"
    assert dataclasses.replace(cfg, epochs=1).epochs == 1


def test_cli_train_save_predict_roundtrip(tmp_path):
    """Training with --ckpt-dir then `predict` restores the same params
    (inference/serving path)."""
    import json

    from graph_odenet_tpu.cli import main

    ck = str(tmp_path / "ck")
    out = capture_json(
        main,
        ["node", "--scale", "0.2", "--epochs", "12", "--model", "gcn",
         "--ckpt-dir", ck, "--quiet"],
    )
    pred = capture_json(
        main, ["predict", "--ckpt-dir", ck, "--scale", "0.2", "--model", "gcn"]
    )
    assert abs(pred["test_acc"] - out["best"]["test_acc"]) < 1e-6
    assert pred["n_node"] > 0
