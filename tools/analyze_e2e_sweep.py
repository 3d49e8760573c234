"""Analyze a completed end-to-end ensemble CV sweep (the flagship result).

Reads the per-combination resume markers written by
`train_ensemble_cv` (grid mode) and prints the numbers RESULTS.md reports:
full-ranking summary, the best combination by median validation AUROC and
by median held-out-test AUROC, where the paper's default {5,9,11}
(`/root/reference/train_ensemble_whole_dataset.py:199-200`) places in both
rankings, and the val-vs-test rank agreement (the generalization question
the reference's test_cv.py was written to answer).

    python tools/analyze_e2e_sweep.py --output_dir /root/outputs/full_e2e
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def load_markers(output_dir: str):
    val, test = {}, {}
    legacy = 0
    for path in sorted(glob.glob(
            os.path.join(output_dir, "sweep_state", "e2e_*.json"))):
        try:
            with open(path) as f:
                blob = json.load(f)
        except ValueError:
            continue        # markers are written atomically; skip junk
        if isinstance(blob, dict) and "val" in blob:
            name = "_".join(str(c) for c in blob["combo"])
            val[name] = blob["val"]
            if blob.get("test"):
                test[name] = blob["test"]
        elif isinstance(blob, dict) and "CV 1" in blob:
            name = os.path.basename(path)[len("e2e_"):].split("_5cv")[0]
            val[name] = blob
            legacy += 1
    return val, test, legacy


def median_metric(folds: dict, key: str) -> float:
    return float(np.median([m[key] for m in folds.values()]))


def rank_of(ranking, name):
    for i, (n, _) in enumerate(ranking):
        if n == name:
            return i + 1
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_dir", default="/root/outputs/full_e2e")
    ap.add_argument("--metric", default="AUROC")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--out_csv", default="",
                    help="also write the full ranking as CSV "
                         "(combo, val median, val rank, test median, "
                         "test rank)")
    args = ap.parse_args()

    val, test, legacy = load_markers(args.output_dir)
    print(f"{len(val)} combinations with val metrics "
          f"({legacy} legacy markers), {len(test)} with test metrics")
    if not val:
        print("no e2e sweep markers found — nothing to rank")
        return

    val_rank = sorted(((n, median_metric(f, args.metric))
                       for n, f in val.items()), key=lambda t: -t[1])
    print(f"\n=== top {args.top} by median validation {args.metric} "
          f"(selection metric, 5 folds) ===")
    for n, a in val_rank[:args.top]:
        t = (f"  test {median_metric(test[n], args.metric):.4f}"
             if n in test else "")
        print(f"  {a:.4f}  ensemble {n}{t}")

    stats = np.array([a for _, a in val_rank])
    print(f"\nval {args.metric} over all {len(val_rank)} combos: "
          f"median {np.median(stats):.4f}, best {stats.max():.4f}, "
          f"worst {stats.min():.4f}")

    paper = "5_9_11"
    if paper in val:
        print(f"\npaper default {{5,9,11}}: val "
              f"{median_metric(val[paper], args.metric):.4f} "
              f"(rank {rank_of(val_rank, paper)}/{len(val_rank)})")

    test_rank = []
    if test:
        test_rank = sorted(((n, median_metric(f, args.metric))
                            for n, f in test.items()), key=lambda t: -t[1])
        print(f"\n=== top {args.top} by median held-out-test "
              f"{args.metric} ===")
        for n, a in test_rank[:args.top]:
            print(f"  {a:.4f}  ensemble {n}  "
                  f"(val {median_metric(val[n], args.metric):.4f}, "
                  f"val-rank {rank_of(val_rank, n)})")
        if paper in test:
            print(f"\npaper default {{5,9,11}}: test "
                  f"{median_metric(test[paper], args.metric):.4f} "
                  f"(rank {rank_of(test_rank, paper)}/{len(test_rank)})")
        common = [n for n, _ in val_rank if n in test]
        if len(common) > 2:
            from scipy.stats import spearmanr

            v = [median_metric(val[n], args.metric) for n in common]
            t = [median_metric(test[n], args.metric) for n in common]
            rho = spearmanr(v, t).statistic
            print(f"\nval-vs-test Spearman rho over {len(common)} combos: "
                  f"{rho:.3f}")

    if args.out_csv:
        trank_pos = {n: i + 1 for i, (n, _) in enumerate(test_rank)}
        tmed = {n: a for n, a in test_rank}
        with open(args.out_csv, "w") as f:
            f.write(f"combo,val_median_{args.metric},val_rank,"
                    f"test_median_{args.metric},test_rank\n")
            for i, (n, a) in enumerate(val_rank):
                tm = f"{tmed[n]:.4f}" if n in tmed else ""
                tr = trank_pos.get(n, "")
                f.write(f"{n},{a:.4f},{i + 1},{tm},{tr}\n")
        print(f"\nfull ranking -> {args.out_csv}")


if __name__ == "__main__":
    main()
