"""Data layer: synthetic planetoid statistics/determinism, n-body physics
invariants, pygcn file-format parsing (SURVEY.md §2 R1/R8)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from graph_odenet_tpu.data import (
    SpringSystem,
    generate_trajectories,
    load_planetoid,
    synthetic_planetoid,
)
from graph_odenet_tpu.data.nbody import one_step_dataset


def test_synthetic_cora_statistics():
    d = synthetic_planetoid("cora", seed=0)
    assert d.n_class == 7
    assert d.graph.n_node == 2708
    assert d.features.shape[1] % 128 == 0
    assert d.features.shape[0] == d.graph.n_node_pad
    assert len(d.idx_train) == 140 and len(d.idx_val) == 300
    assert len(d.idx_test) == 1000
    # Row-normalised features.
    sums = np.asarray(d.features.sum(axis=1))[: d.graph.n_node]
    np.testing.assert_allclose(sums[sums > 0], 1.0, atol=1e-4)


def test_synthetic_determinism_and_seed_variation():
    a = synthetic_planetoid("cora", seed=3, scale=0.1)
    b = synthetic_planetoid("cora", seed=3, scale=0.1)
    c = synthetic_planetoid("cora", seed=4, scale=0.1)
    assert np.array_equal(np.asarray(a.labels), np.asarray(b.labels))
    assert np.array_equal(np.asarray(a.graph.senders), np.asarray(b.graph.senders))
    assert not np.array_equal(np.asarray(a.labels), np.asarray(c.labels))


def test_planetoid_file_parser(tmp_path):
    """pygcn .content/.cites format round-trips through the loader."""
    content = "\n".join(
        [
            "n0 1 0 1 classA",
            "n1 0 1 0 classB",
            "n2 1 1 0 classA",
        ]
    )
    cites = "n0 n1\nn2 n0\nn0 missing_id\n"
    (tmp_path / "toy.content").write_text(content)
    (tmp_path / "toy.cites").write_text(cites)
    import graph_odenet_tpu.data.planetoid as pl

    pl._SPLITS["toy"] = (range(1), range(1, 2), range(2, 3))
    d = load_planetoid("toy", str(tmp_path))
    assert d.n_class == 2
    assert d.graph.n_node == 3
    # 2 valid citations symmetrised + 3 self loops, dangling edge dropped.
    assert d.graph.n_edge == 2 * 2 + 3
    assert np.asarray(d.labels)[:3].tolist() == [0, 1, 0]


def test_nbody_shapes_and_determinism():
    sys_ = SpringSystem(n_bodies=4)
    k = jax.random.PRNGKey(0)
    t1 = generate_trajectories(sys_, k, n_sims=3, n_steps=10)
    t2 = generate_trajectories(sys_, k, n_sims=3, n_steps=10)
    assert t1.shape == (3, 11, 4, 5)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_nbody_momentum_conserved_without_damping():
    """Spring forces are equal-and-opposite ⇒ Σ m·v is invariant."""
    sys_ = SpringSystem(n_bodies=5, damping=0.0)
    trajs = generate_trajectories(sys_, jax.random.PRNGKey(1), 2, 200)
    mass = np.asarray(trajs[..., :1])
    vel = np.asarray(trajs[..., 3:5])
    p = (mass * vel).sum(axis=2)  # [S, T, 2]
    drift = np.abs(p - p[:, :1]).max()
    assert drift < 1e-3, drift


def test_nbody_energy_reasonable():
    """Semi-implicit Euler on springs: energy bounded (no blow-up)."""
    sys_ = SpringSystem(n_bodies=4, damping=0.0)
    trajs = np.asarray(generate_trajectories(sys_, jax.random.PRNGKey(2), 1, 500))
    assert np.all(np.isfinite(trajs))
    pos = trajs[0, :, :, 1:3]
    assert np.abs(pos).max() < 100.0


def test_one_step_dataset():
    sys_ = SpringSystem(n_bodies=3)
    trajs = generate_trajectories(sys_, jax.random.PRNGKey(3), 2, 5)
    x, y = one_step_dataset(trajs)
    assert x.shape == (10, 3, 5) and y.shape == (10, 3, 2)
    np.testing.assert_allclose(
        np.asarray(y[0]), np.asarray(trajs[0, 1, :, 3:5]), atol=1e-6
    )


def test_ogbn_arxiv_file_parser(tmp_path):
    """ogb CSV layout (node-feat/node-label/edge) round-trips through
    load_ogbn_arxiv with the deterministic index splits."""
    import numpy as np

    from graph_odenet_tpu.data.ogbn import load_ogbn_arxiv

    rng = np.random.default_rng(0)
    n, f = 12, 4
    feats = rng.random((n, f)).astype(np.float32)
    labels = rng.integers(0, 3, size=n)
    edges = np.stack([rng.permutation(n), rng.permutation(n)], axis=1)
    np.savetxt(tmp_path / "node-feat.csv", feats, delimiter=",")
    np.savetxt(tmp_path / "node-label.csv", labels, delimiter=",", fmt="%d")
    np.savetxt(tmp_path / "edge.csv", edges, delimiter=",", fmt="%d")

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # fallback split must warn
        try:
            d = load_ogbn_arxiv(str(tmp_path))
            raise AssertionError("expected a fallback-split warning")
        except UserWarning:
            pass
        warnings.simplefilter("ignore")
        d = load_ogbn_arxiv(str(tmp_path))
    assert d.graph.n_node == n
    assert d.n_class == int(labels.max()) + 1
    assert np.asarray(d.labels)[:n].tolist() == labels.tolist()
    # 54/16/30 fallback split convention over node indices.
    assert len(d.idx_train) == int(0.54 * n)
    assert int(d.idx_test[-1]) == n - 1

    # With node_year.csv present, the OFFICIAL time-based protocol applies:
    # train ≤2017, val =2018, test ≥2019 (VERDICT r4 #7).
    years = np.array([2015, 2016, 2017, 2018, 2018, 2019, 2020, 2017,
                      2019, 2016, 2018, 2020])
    np.savetxt(tmp_path / "node_year.csv", years, delimiter=",", fmt="%d")
    d = load_ogbn_arxiv(str(tmp_path))
    assert sorted(np.asarray(d.idx_train).tolist()) == sorted(
        np.nonzero(years <= 2017)[0].tolist()
    )
    assert sorted(np.asarray(d.idx_val).tolist()) == sorted(
        np.nonzero(years == 2018)[0].tolist()
    )
    assert sorted(np.asarray(d.idx_test).tolist()) == sorted(
        np.nonzero(years >= 2019)[0].tolist()
    )


def test_synthetic_arxiv_difficulty_knobs():
    """Calibrated twin construction: confusion redraws features from a
    fixed partner class; knobs only change features/edges, not structure
    invariants (VERDICT r4 #4)."""
    from graph_odenet_tpu.data.ogbn import (
        ARXIV_CALIBRATED, synthetic_ogbn_arxiv,
    )

    d_easy = synthetic_ogbn_arxiv(seed=0, scale=0.01)
    d_hard = synthetic_ogbn_arxiv(seed=0, scale=0.01, calibrated=True)
    assert d_easy.n_class == d_hard.n_class == 40
    assert d_easy.features.shape == d_hard.features.shape
    # Same graph-scale invariants, different features.
    assert d_easy.graph.n_node == d_hard.graph.n_node
    assert not np.allclose(
        np.asarray(d_easy.features), np.asarray(d_hard.features)
    )
    assert set(ARXIV_CALIBRATED) == {"feature_noise", "homophily", "confusion"}
