"""OGBN-arxiv loader + synthetic twin (the BASELINE config[4] multi-host
workload).

The real dataset ships as CSVs (``node-feat.csv``/``edge.csv``/
``node-label.csv`` after ogb extraction); ``load_ogbn_arxiv`` parses that
layout if present.  ``synthetic_ogbn_arxiv`` generates a deterministic
power-law citation graph at the same scale (169,343 nodes / 1,166,243
directed edges / 128-dim features / 40 classes) for environments without
the download — the scaling benchmark only needs realistic degree skew, not
real text embeddings.
"""

from __future__ import annotations

import os

import numpy as np

from graph_odenet_tpu.data.planetoid import NodeClassificationData, _finalize

__all__ = ["load_ogbn_arxiv", "synthetic_ogbn_arxiv"]

_N, _E, _F, _C = 169_343, 1_166_243, 128, 40


def load_ogbn_arxiv(path: str) -> NodeClassificationData:
    feats = np.loadtxt(os.path.join(path, "node-feat.csv"), delimiter=",", dtype=np.float32)
    labels = np.loadtxt(os.path.join(path, "node-label.csv"), delimiter=",", dtype=np.int64)
    edges = np.loadtxt(os.path.join(path, "edge.csv"), delimiter=",", dtype=np.int64)
    n = feats.shape[0]
    # The real OGBN-arxiv protocol is a TIME split, not an index split:
    # train on papers published until 2017, validate on 2018, test on 2019+.
    # Parse node_year.csv when present; otherwise fall back to a contiguous
    # 54/16/30 approximation (matching the real split's proportions) with a
    # loud warning — accuracy from the fallback is NOT protocol-comparable.
    year_path = os.path.join(path, "node_year.csv")
    if os.path.exists(year_path):
        years = np.loadtxt(year_path, delimiter=",", dtype=np.int64)
        years = years.reshape(n)
        tr = np.nonzero(years <= 2017)[0]
        va = np.nonzero(years == 2018)[0]
        te = np.nonzero(years >= 2019)[0]
    else:
        import warnings

        warnings.warn(
            "ogbn-arxiv: node_year.csv not found — using a contiguous "
            "54/16/30 index split instead of the official time-based split; "
            "results will not match the OGB leaderboard protocol.",
            stacklevel=2,
        )
        tr = range(0, int(0.54 * n))
        va = range(int(0.54 * n), int(0.7 * n))
        te = range(int(0.7 * n), n)
    return _finalize(
        "ogbn-arxiv", feats, labels.astype(np.int32),
        edges[:, 0], edges[:, 1], int(labels.max()) + 1, splits=(tr, va, te),
    )


#: Difficulty constants calibrated (round 5, scripts/calibrate_arxiv_twin.py)
#: so the config-4 R7 recipe on the twin lands near the real OGBN-arxiv GCN
#: accuracy (~0.71, OGB leaderboard) instead of the uncalibrated twin's
#: saturated 0.985 — same methodology as data.planetoid.CALIBRATED.
#: Knobs: ``confusion`` is the fraction of nodes that look like a fixed
#: confusable partner class in EVERY observable — features AND homophilous
#: wiring — modelling genuinely ambiguous subject areas.  Because neither
#: modality carries the true label for those nodes, the error is
#: irreducible (ceiling ≈ 1 − confusion, epoch-robust): a feature-only
#: confusion was measured drifting 0.736 → 0.859 between 200 and 400
#: epochs as the GCN recovered confused nodes through the graph.
#: ``feature_noise`` has a sharp accuracy cliff past σ ≈ 1.0 under the
#: abs + row-normalise transform — keep ≤ 0.9.
ARXIV_CALIBRATED = dict(feature_noise=0.8, homophily=0.5, confusion=0.235)


def synthetic_ogbn_arxiv(
    *, seed: int = 0, scale: float = 1.0, node_multiple: int = 128,
    feature_noise: float = 0.8, homophily: float = 0.5,
    confusion: float = 0.0, calibrated: bool = False,
) -> NodeClassificationData:
    """Power-law citation graph at arxiv scale with class-correlated
    Gaussian features (compact — no bag-of-words at this size).

    ``calibrated=True`` swaps in ``ARXIV_CALIBRATED`` so twin accuracy is
    comparable to published real-data numbers; the default knobs keep the
    (easy) round-2 twin for scaling/throughput work where convergence
    difficulty is irrelevant.
    """
    if calibrated:
        cal = ARXIV_CALIBRATED
        feature_noise = cal["feature_noise"]
        homophily = cal["homophily"]
        confusion = cal["confusion"]
    n = int(_N * scale)
    e = int(_E * scale)
    c = _C
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, c, size=n).astype(np.int32)

    # Effective (observable) class: confused nodes present as a fixed
    # confusable partner class in BOTH features and homophilous wiring, so
    # no amount of training recovers them — the irreducible-error knob.
    eff = labels.copy()
    if confusion > 0.0:
        p = rng.permutation(c).astype(np.int32)
        partner = np.empty(c, np.int32)
        partner[p] = np.roll(p, -1)  # fixed-point-free pairing
        confused = rng.random(n) < confusion
        eff = np.where(confused, partner[labels], labels).astype(np.int32)

    # Zipf-ish receiver popularity (citation hubs) + homophilous rewiring.
    pop = rng.zipf(1.7, size=e).astype(np.int64) % n
    src = rng.integers(0, n, size=e)
    same = rng.random(e) < homophily
    # For homophilous edges, retarget the receiver within the sender's
    # OBSERVABLE class pool.
    cls_nodes = [np.nonzero(eff == k)[0] for k in range(c)]
    tgt = pop.copy()
    for k in range(c):
        sel = same & (eff[src] == k)
        if sel.sum() and len(cls_nodes[k]):
            tgt[sel] = rng.choice(cls_nodes[k], size=int(sel.sum()))
    ok = src != tgt
    src, tgt = src[ok], tgt[ok]

    class_means = rng.standard_normal((c, _F)).astype(np.float32)
    feats = class_means[eff] + feature_noise * rng.standard_normal(
        (n, _F)
    ).astype(np.float32)
    feats = np.abs(feats)  # keep row-normalisation (in _finalize) meaningful

    tr = range(0, int(0.54 * n))
    va = range(int(0.54 * n), int(0.7 * n))
    te = range(int(0.7 * n), n)
    d = _finalize(
        "ogbn-arxiv-synthetic", feats, labels, src, tgt, c, splits=(tr, va, te)
    )
    return d
