"""Aux subsystems: checkpoint/resume determinism, metrics logging
(SURVEY.md §5)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from graph_odenet_tpu.utils import MetricsLogger
from graph_odenet_tpu.utils.checkpoint import Checkpointer
from graph_odenet_tpu.utils.metrics import masked_accuracy, masked_nll


def test_checkpoint_save_restore_roundtrip(tmp_path):
    state = dict(
        params=dict(w=jnp.arange(6.0).reshape(2, 3), b=jnp.zeros(3)),
        step=jnp.asarray(7),
    )
    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save(7, state, wait=True)
    ck.save(9, jax.tree_util.tree_map(lambda a: a + 1, state), wait=True)
    assert ck.latest_step() == 9
    like = jax.tree_util.tree_map(np.zeros_like, state)
    restored = ck.restore(like)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3) + 1)
    # Restore a specific earlier step — resume-from-step determinism.
    restored7 = ck.restore(like, step=7)
    np.testing.assert_allclose(np.asarray(restored7["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    ck.close()


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    log.write(epoch=0, loss=1.5)
    log.write(epoch=1, loss=jnp.asarray(0.75))
    log.close()
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["epoch"] == 0 and recs[1]["loss"] == 0.75
    assert all("t" in r for r in recs)


def test_masked_metrics():
    lp = jnp.log(jnp.asarray([[0.7, 0.3], [0.2, 0.8], [0.5, 0.5]]))
    labels = jnp.asarray([0, 1, 0])
    idx = jnp.asarray([0, 1])
    acc = masked_accuracy(lp, labels, idx)
    nll = masked_nll(lp, labels, idx)
    assert float(acc) == 1.0
    np.testing.assert_allclose(float(nll), -(np.log(0.7) + np.log(0.8)) / 2, rtol=1e-6)
