"""Aggregate the 18x100 baseline bootstrap grid into per-config CIs.

The reference's bootstrap leg (`/root/reference/train_baseline_bootstrap.py:238-282`)
trains each config on `num_rep` seeded resamples of training.csv and keeps
each replicate's best-rule validation metrics; its uncertainty idiom is the
percentile CI over replicates (`/root/reference/test_cv.py:82-96`).  This
tool reads the sweep's resume markers (boot_s{chunk}_group_*.json — one per
(replicate-chunk, shape-group), each holding {conf: {bootK: metrics}}) and
reports, per config, the replicate count, median, and [2.5, 97.5]
percentile CI for the selection metric.

    python tools/analyze_baseline_bootstrap.py \
        --output_dir /root/outputs/baseline_boot --out_json docs/...json
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def collect(state_dir: str) -> dict:
    """Merge all boot markers -> {conf_int: {bootK: {metric: val}}}."""
    per_conf: dict = {}
    for path in sorted(glob.glob(os.path.join(state_dir,
                                              "boot_s*_group_*.json"))):
        try:
            with open(path) as f:
                blob = json.load(f)
        except ValueError:
            continue
        if not isinstance(blob, dict):
            continue
        for conf, reps in blob.items():
            try:
                c = int(conf)
            except ValueError:
                continue
            per_conf.setdefault(c, {}).update(reps)
    return per_conf


def summarize(per_conf: dict, metric: str = "AUROC") -> dict:
    out = {}
    for c in sorted(per_conf):
        vals = np.asarray([r[metric] for r in per_conf[c].values()
                           if metric in r], np.float64)
        if not len(vals):
            continue
        out[f"conf{c}"] = {
            "n_replicates": int(len(vals)),
            "median": round(float(np.median(vals)), 4),
            "mean": round(float(np.mean(vals)), 4),
            "p2.5": round(float(np.percentile(vals, 2.5)), 4),
            "p97.5": round(float(np.percentile(vals, 97.5)), 4),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_dir", default="/root/outputs/baseline_boot")
    ap.add_argument("--metric", default="AUROC")
    ap.add_argument("--out_json", default="")
    args = ap.parse_args()

    per_conf = collect(os.path.join(args.output_dir, "sweep_state"))
    summary = summarize(per_conf, args.metric)
    if not summary:
        raise SystemExit(f"no boot markers under {args.output_dir}")

    total = sum(s["n_replicates"] for s in summary.values())
    print(f"baseline bootstrap: {len(summary)} configs, "
          f"{total} (config, replicate) cells, metric={args.metric}")
    for name, s in summary.items():
        print(f"  {name:7s} n={s['n_replicates']:4d}  "
              f"median {s['median']:.4f}  "
              f"95% CI [{s['p2.5']:.4f}, {s['p97.5']:.4f}]")
    ranked = sorted(summary.items(), key=lambda kv: -kv[1]["median"])
    print(f"best by median {args.metric}: {ranked[0][0]} "
          f"({ranked[0][1]['median']:.4f}); "
          f"worst: {ranked[-1][0]} ({ranked[-1][1]['median']:.4f})")

    if args.out_json:
        os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
        with open(args.out_json, "w") as f:
            json.dump({"metric": args.metric, "per_config": summary},
                      f, indent=1)
        print(f"written -> {args.out_json}")


if __name__ == "__main__":
    main()
