"""Paired ODE-vs-discrete deltas (VERDICT r4 #1 / weak #7).

Each accuracy.jsonl seed regenerates the twin, but the SAME (dataset,
seed) pair sees the SAME twin instance across models — so the per-seed
difference (ODE − discrete) is free of twin-sampling variance.  This
script prints:

  1. the full model × dataset matrix (mean ± std over seeds);
  2. paired deltas: {gcnode−gcn, gatode−gat, resgcn−gcn, resgat−gat}
     per dataset, with the paired std and the per-seed signs;
  3. the twin-difficulty sweep's paired gcnode−gcn delta per noise level
     (artifacts/twin_difficulty.jsonl), the controlled experiment for the
     cora −4.4 pt anomaly.

Pure-numpy postprocessing — safe to run while sweeps are appending.
"""

import collections
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACC = "artifacts/accuracy.jsonl"
TWIN = "artifacts/twin_difficulty.jsonl"

# canonical config label → (dataset, family-key)
DATASETS = ("cora", "citeseer", "pubmed")
ALIASES = {
    "idx0": ("cora", "gcn"),
    "idx1": ("cora", "gcnode"),
    "idx2": ("citeseer", "gatode"),
}


def parse_label(label):
    if label in ALIASES:
        return ALIASES[label]
    for d in DATASETS:
        if label.startswith(d + "-"):
            return d, label[len(d) + 1:]
    return None, label


def main():
    cell = collections.defaultdict(dict)   # (dataset, model) -> {seed: acc}
    for line in open(ACC):
        r = json.loads(line)
        d, m = parse_label(r["config"])
        if d:
            cell[(d, m)][r["seed"]] = r["test_acc"]

    models = ["gcn", "resgcn", "gcnode", "gat", "resgat", "gatode"]
    print("## Full matrix (test acc, mean ± std [n seeds])\n")
    print("| model | " + " | ".join(DATASETS) + " |")
    print("|---|" + "---|" * len(DATASETS))
    for m in models:
        row = [m]
        for d in DATASETS:
            v = np.array(sorted(cell.get((d, m), {}).items()))
            row.append(
                f"{v[:,1].mean():.3f} ± {v[:,1].std():.3f} [{len(v)}]"
                if len(v) else "—"
            )
        print("| " + " | ".join(row) + " |")

    print("\n## Paired deltas (ODE/residual − discrete, same twin per seed)\n")
    pairs = [("gcnode", "gcn"), ("gatode", "gat"),
             ("resgcn", "gcn"), ("resgat", "gat")]
    print("| pair | " + " | ".join(DATASETS) + " |")
    print("|---|" + "---|" * len(DATASETS))
    for a, b in pairs:
        row = [f"{a} − {b}"]
        for d in DATASETS:
            aa, bb = cell.get((d, a), {}), cell.get((d, b), {})
            seeds = sorted(set(aa) & set(bb))
            if not seeds:
                row.append("—")
                continue
            diff = np.array([aa[s] - bb[s] for s in seeds])
            row.append(
                f"{diff.mean()*100:+.1f} ± {diff.std()*100:.1f} pts "
                f"[{(diff > 0).sum()}/{len(diff)}+]"
            )
        print("| " + " | ".join(row) + " |")

    if os.path.exists(TWIN):
        print("\n## Twin-difficulty sweep: paired gcnode − gcn per noise\n")
        tw = collections.defaultdict(dict)  # (noise, model) -> {seed: acc}
        for line in open(TWIN):
            r = json.loads(line)
            tw[(r["noise_words"], r["model"])][r["seed"]] = r["test_acc"]
        noises = sorted({n for n, _ in tw})
        print("| noise_words | gcn | gcnode | paired Δ (pts) | signs |")
        print("|---|---|---|---|---|")
        for n in noises:
            g, o = tw.get((n, "gcn"), {}), tw.get((n, "gcnode"), {})
            seeds = sorted(set(g) & set(o))
            if not seeds:
                continue
            gv = np.array([g[s] for s in seeds])
            ov = np.array([o[s] for s in seeds])
            diff = ov - gv
            print(
                f"| {n} | {gv.mean():.3f} | {ov.mean():.3f} | "
                f"{diff.mean()*100:+.1f} ± {diff.std()*100:.1f} | "
                f"{(diff > 0).sum()}/{len(diff)}+ |"
            )


if __name__ == "__main__":
    main()
