"""Analyze a completed end-to-end ensemble grid sweep (the flagship result).

Reads the per-combination resume markers written by `train_ensemble_cv`
(grid mode, prefix e2e_) or `train_ensemble_bootstrap` (grid mode, prefix
boot_) and prints the numbers RESULTS.md reports: full-ranking summary,
the best combination by median validation AUROC and by median
held-out-test AUROC, where the paper's default {5,9,11}
(`/root/reference/train_ensemble_whole_dataset.py:199-200`) places in both
rankings, and the val-vs-test rank agreement (the generalization question
the reference's test_cv.py was written to answer).

Uncertainty (VERDICT r4 #2 — report what the framework itself measured):
  * per-combination 2.5-97.5 percentile bands over folds/replicates in the
    CSV (the reference's own CI idiom, `test_cv.py:82-96`);
  * the Spearman rho gets a combo-bootstrap 95% CI and a permutation-test
    p-value (both resampling-based, seeded, pure host work);
  * the per-cell dropout-stream noise floor from
    docs/grid_dropout_deviation.json is printed next to the ranking so
    single-rank differences are read against it.

    python tools/analyze_e2e_sweep.py --output_dir /root/outputs/full_e2e
    python tools/analyze_e2e_sweep.py --output_dir /root/outputs/full_boot \
        --marker_prefix boot
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def load_markers(output_dir: str, prefix: str = "e2e"):
    val, test = {}, {}
    legacy = 0
    for path in sorted(glob.glob(
            os.path.join(output_dir, "sweep_state", f"{prefix}_*.json"))):
        try:
            with open(path) as f:
                blob = json.load(f)
        except ValueError:
            continue        # markers are written atomically; skip junk
        if isinstance(blob, dict) and "val" in blob and "combo" in blob:
            name = "_".join(str(c) for c in blob["combo"])
            val[name] = blob["val"]
            if blob.get("test"):
                test[name] = blob["test"]
        elif isinstance(blob, dict) and "val" in blob:
            # early bootstrap markers carried no combo field; the name is
            # the filename between the prefix and the run fingerprint
            # (boot_<a>_<b>_<c>_<R>rep_...)
            stem = os.path.basename(path)[len(prefix) + 1:]
            name = stem.split("rep_")[0].rsplit("_", 1)[0]
            val[name] = blob["val"]
            if blob.get("test"):
                test[name] = blob["test"]
        elif isinstance(blob, dict) and "CV 1" in blob:
            name = os.path.basename(path)[len(prefix) + 1:].split("_5cv")[0]
            val[name] = blob
            legacy += 1
    return val, test, legacy


def median_metric(folds: dict, key: str) -> float:
    return float(np.median([m[key] for m in folds.values()]))


def pct_band(folds: dict, key: str, lo=2.5, hi=97.5):
    """The reference's own CI idiom (`test_cv.py:82-96`): percentiles of
    the per-fold/per-replicate metric distribution."""
    xs = [m[key] for m in folds.values()]
    return float(np.percentile(xs, lo)), float(np.percentile(xs, hi))


def rank_of(ranking, name):
    for i, (n, _) in enumerate(ranking):
        if n == name:
            return i + 1
    return None


def rho_with_uncertainty(v, t, n_boot=10000, n_perm=10000, seed=0):
    """Spearman rho + combo-bootstrap 95% CI + permutation p-value."""
    from scipy.stats import spearmanr

    v = np.asarray(v)
    t = np.asarray(t)
    n = len(v)
    rho = spearmanr(v, t).statistic
    rng = np.random.default_rng(seed)
    boots = np.empty(n_boot)
    for i in range(n_boot):
        idx = rng.integers(0, n, n)
        boots[i] = spearmanr(v[idx], t[idx]).statistic
    lo, hi = np.percentile(boots, [2.5, 97.5])
    perms = np.empty(n_perm)
    for i in range(n_perm):
        perms[i] = spearmanr(v, rng.permutation(t)).statistic
    # two-sided: how often does a label-shuffled rho beat the observed one
    p = float((np.sum(np.abs(perms) >= abs(rho)) + 1) / (n_perm + 1))
    return float(rho), float(lo), float(hi), p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_dir", default="/root/outputs/full_e2e")
    ap.add_argument("--marker_prefix", default="e2e",
                    help="e2e (CV grid) or boot (bootstrap grid)")
    ap.add_argument("--metric", default="AUROC")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--noise_json", default="docs/grid_dropout_deviation.json",
                    help="per-cell dropout-stream deviation measurement; "
                         "printed as the ranking's noise floor")
    ap.add_argument("--out_csv", default="",
                    help="also write the full ranking as CSV "
                         "(combo, val median + 2.5/97.5 band, val rank, "
                         "test median + band, test rank)")
    ap.add_argument("--compare_csv", default="",
                    help="a prior ranking CSV from this tool (e.g. the CV "
                         "grid's) — prints cross-PROTOCOL rank agreement "
                         "over the common combos: do 5-fold CV and 5-rep "
                         "bootstrap select the same ensembles?")
    args = ap.parse_args()

    val, test, legacy = load_markers(args.output_dir, args.marker_prefix)
    print(f"{len(val)} combinations with val metrics "
          f"({legacy} legacy markers), {len(test)} with test metrics")
    if not val:
        print("no sweep markers found — nothing to rank")
        return

    n_units = len(next(iter(val.values())))
    unit = "folds" if args.marker_prefix == "e2e" else "replicates"
    val_rank = sorted(((n, median_metric(f, args.metric))
                       for n, f in val.items()), key=lambda t: -t[1])
    print(f"\n=== top {args.top} by median validation {args.metric} "
          f"(selection metric, {n_units} {unit}) ===")
    for n, a in val_rank[:args.top]:
        lo, hi = pct_band(val[n], args.metric)
        t = (f"  test {median_metric(test[n], args.metric):.4f}"
             if n in test else "")
        print(f"  {a:.4f} [{lo:.3f},{hi:.3f}]  ensemble {n}{t}")

    stats = np.array([a for _, a in val_rank])
    print(f"\nval {args.metric} over all {len(val_rank)} combos: "
          f"median {np.median(stats):.4f}, best {stats.max():.4f}, "
          f"worst {stats.min():.4f}")

    if os.path.exists(args.noise_json):
        try:
            with open(args.noise_json) as f:
                dev = json.load(f)
            print(f"noise floor: per-cell |d{args.metric}| from the dropout "
                  f"stream alone averages "
                  f"{dev['summary'][args.metric]['mean_abs']:.3f} "
                  f"(rank agreement across streams rho="
                  f"{dev['spearman_median_auroc']:.2f}) — single-rank "
                  f"differences below this are noise "
                  f"({args.noise_json})")
        except (ValueError, KeyError):
            pass

    paper = "5_9_11"
    if paper in val:
        lo, hi = pct_band(val[paper], args.metric)
        print(f"\npaper default {{5,9,11}}: val "
              f"{median_metric(val[paper], args.metric):.4f} "
              f"[{lo:.3f},{hi:.3f}] "
              f"(rank {rank_of(val_rank, paper)}/{len(val_rank)})")

    test_rank = []
    if test:
        test_rank = sorted(((n, median_metric(f, args.metric))
                            for n, f in test.items()), key=lambda t: -t[1])
        print(f"\n=== top {args.top} by median held-out-test "
              f"{args.metric} ===")
        for n, a in test_rank[:args.top]:
            lo, hi = pct_band(test[n], args.metric)
            print(f"  {a:.4f} [{lo:.3f},{hi:.3f}]  ensemble {n}  "
                  f"(val {median_metric(val[n], args.metric):.4f}, "
                  f"val-rank {rank_of(val_rank, n)})")
        if paper in test:
            lo, hi = pct_band(test[paper], args.metric)
            print(f"\npaper default {{5,9,11}}: test "
                  f"{median_metric(test[paper], args.metric):.4f} "
                  f"[{lo:.3f},{hi:.3f}] "
                  f"(rank {rank_of(test_rank, paper)}/{len(test_rank)})")
        common = [n for n, _ in val_rank if n in test]
        if len(common) > 2:
            v = [median_metric(val[n], args.metric) for n in common]
            t = [median_metric(test[n], args.metric) for n in common]
            rho, lo, hi, p = rho_with_uncertainty(v, t)
            print(f"\nval-vs-test Spearman rho over {len(common)} combos: "
                  f"{rho:.3f}, 95% bootstrap CI [{lo:.3f}, {hi:.3f}], "
                  f"permutation p={p:.3f} "
                  f"(10k combo-bootstraps / 10k label shuffles, seed 0)")

    if args.compare_csv and os.path.exists(args.compare_csv):
        # cross-protocol agreement: this grid's medians vs a prior grid's
        # (same CSV schema as --out_csv writes).  Both rankings carry
        # per-cell seed noise ~0.08 AUROC, so low rho is the expected
        # honest answer — the point is to measure it.
        import csv as _csv

        prior_v, prior_t = {}, {}
        with open(args.compare_csv) as f:
            for row in _csv.DictReader(f):
                prior_v[row["combo"]] = float(row[f"val_median_{args.metric}"])
                tcol = row.get(f"test_median_{args.metric}", "")
                if tcol:
                    prior_t[row["combo"]] = float(tcol)
        common = [n for n in val if n in prior_v]
        if len(common) > 2:
            a = [median_metric(val[n], args.metric) for n in common]
            b = [prior_v[n] for n in common]
            rho, lo, hi, p = rho_with_uncertainty(a, b)
            print(f"\ncross-protocol val-rank agreement vs "
                  f"{os.path.basename(args.compare_csv)} over {len(common)} "
                  f"combos: rho={rho:.3f}, 95% CI [{lo:.3f}, {hi:.3f}], "
                  f"permutation p={p:.3f}")
        common_t = [n for n in test if n in prior_t]
        if len(common_t) > 2:
            a = [median_metric(test[n], args.metric) for n in common_t]
            b = [prior_t[n] for n in common_t]
            rho, lo, hi, p = rho_with_uncertainty(a, b)
            print(f"cross-protocol TEST-rank agreement over {len(common_t)} "
                  f"combos: rho={rho:.3f}, 95% CI [{lo:.3f}, {hi:.3f}], "
                  f"permutation p={p:.3f} (same combos, disjoint "
                  f"training/eval draws — this is the replicability of the "
                  f"held-out ranking itself)")

    if args.out_csv:
        trank_pos = {n: i + 1 for i, (n, _) in enumerate(test_rank)}
        tmed = {n: a for n, a in test_rank}
        m = args.metric
        with open(args.out_csv, "w") as f:
            f.write(f"combo,val_median_{m},val_p2.5,val_p97.5,val_rank,"
                    f"test_median_{m},test_p2.5,test_p97.5,test_rank\n")
            for i, (n, a) in enumerate(val_rank):
                vlo, vhi = pct_band(val[n], m)
                if n in tmed:
                    tlo, thi = pct_band(test[n], m)
                    tcols = f"{tmed[n]:.4f},{tlo:.4f},{thi:.4f}," \
                            f"{trank_pos[n]}"
                else:
                    tcols = ",,,"
                f.write(f"{n},{a:.4f},{vlo:.4f},{vhi:.4f},{i + 1},"
                        f"{tcols}\n")
        print(f"\nfull ranking -> {args.out_csv}")


if __name__ == "__main__":
    main()
