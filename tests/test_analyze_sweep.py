"""tools/analyze_e2e_sweep.py: marker parsing + ranking math.

The analyzer turns the grid sweep's resume markers into the flagship
numbers RESULTS.md reports (full ranking, paper-default placement,
val-vs-test agreement) — so its marker-schema handling (current
{"combo","val","test"} blobs AND legacy val-only fold dicts) is
load-bearing for the scientific output.
"""

import importlib.util
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "analyze_e2e_sweep", os.path.join(REPO, "tools", "analyze_e2e_sweep.py"))
analyze = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(analyze)


def _folds(auroc_by_fold):
    return {f"CV {i + 1}": {"AUROC": a, "Accuracy": 0.5}
            for i, a in enumerate(auroc_by_fold)}


def test_load_markers_both_schemas(tmp_path):
    state = tmp_path / "sweep_state"
    state.mkdir()
    # current schema: combo + val + test
    (state / "e2e_1_2_3_5cv_100ep_4b_0.0001lr_42s_grid.json").write_text(
        json.dumps({"combo": [1, 2, 3], "fingerprint": "x",
                    "val": _folds([0.6, 0.7, 0.8]),
                    "test": _folds([0.5, 0.55, 0.65])}))
    # current schema, no test metrics yet
    (state / "e2e_2_3_4_5cv_100ep_4b_0.0001lr_42s_grid.json").write_text(
        json.dumps({"combo": [2, 3, 4], "fingerprint": "x",
                    "val": _folds([0.9, 0.9, 0.9]), "test": None}))
    # legacy schema: bare {fold: metrics} dict, combo in the filename
    (state / "e2e_5_9_11_5cv_100ep_4b_0.0001lr_42s.json").write_text(
        json.dumps(_folds([0.4, 0.5, 0.6])))
    # junk that must not crash the parse
    (state / "e2e_bad.json").write_text("not json")

    val, test, legacy = analyze.load_markers(str(tmp_path))
    assert set(val) == {"1_2_3", "2_3_4", "5_9_11"}
    assert set(test) == {"1_2_3"}
    assert legacy == 1
    assert np.isclose(analyze.median_metric(val["1_2_3"], "AUROC"), 0.7)
    assert np.isclose(analyze.median_metric(test["1_2_3"], "AUROC"), 0.55)


def test_load_markers_boot_prefix(tmp_path):
    """The bootstrap grid's markers (prefix boot_) load with
    --marker_prefix boot, including the early schema without a combo
    field (name recovered from the filename)."""
    state = tmp_path / "sweep_state"
    state.mkdir()
    (state / "boot_1_2_3_5rep_100ep_4b_0.0001lr_42s_grid.json").write_text(
        json.dumps({"combo": [1, 2, 3], "val": _folds([0.6, 0.7]),
                    "test": _folds([0.5, 0.55])}))
    (state / "boot_4_5_16_5rep_100ep_4b_0.0001lr_42s_grid.json").write_text(
        json.dumps({"val": _folds([0.9, 0.9]), "test": None}))
    val, test, legacy = analyze.load_markers(str(tmp_path), "boot")
    assert set(val) == {"1_2_3", "4_5_16"}
    assert set(test) == {"1_2_3"}
    assert legacy == 0


def test_rho_with_uncertainty_significant_vs_null():
    rng = np.random.default_rng(1)
    x = rng.normal(size=60)
    # strongly correlated pair -> tight CI excluding 0, tiny p
    rho, lo, hi, p = analyze.rho_with_uncertainty(
        x, x + 0.1 * rng.normal(size=60), n_boot=500, n_perm=500, seed=2)
    assert rho > 0.9 and lo > 0.8 and p < 0.01
    # independent pair -> CI straddles 0, large p
    rho0, lo0, hi0, p0 = analyze.rho_with_uncertainty(
        x, rng.normal(size=60), n_boot=500, n_perm=500, seed=2)
    assert lo0 < 0 < hi0 and p0 > 0.05


def test_ranking_and_rank_of():
    val = {"1_2_3": _folds([0.6, 0.7, 0.8]),
           "2_3_4": _folds([0.9, 0.9, 0.9]),
           "5_9_11": _folds([0.4, 0.5, 0.6])}
    rank = sorted(((n, analyze.median_metric(f, "AUROC"))
                   for n, f in val.items()), key=lambda t: -t[1])
    assert [n for n, _ in rank] == ["2_3_4", "1_2_3", "5_9_11"]
    assert analyze.rank_of(rank, "5_9_11") == 3
    assert analyze.rank_of(rank, "9_9_9") is None


def test_compare_csv_cross_protocol(tmp_path, monkeypatch, capsys):
    """--compare_csv prints rank agreement against a prior grid's ranking
    CSV (the CV-vs-bootstrap protocol-replicability number)."""
    state = tmp_path / "sweep_state"
    state.mkdir()
    rng = np.random.default_rng(0)
    combos = [f"{a}_{a + 1}_{a + 2}" for a in range(1, 13)]
    prior_rows = []
    for i, name in enumerate(combos):
        v = 0.5 + 0.04 * i
        (state / f"boot_{name}_5rep_100ep_4b_0.0001lr_42s_grid.json"
         ).write_text(json.dumps({
             "combo": [int(x) for x in name.split("_")],
             "val": _folds([v - 0.02, v, v + 0.02]),
             "test": _folds([v - 0.05, v, v + 0.05])}))
        prior_rows.append(
            f"{name},{v:.4f},{v - .02:.4f},{v + .02:.4f},{12 - i},"
            f"{v:.4f},{v - .05:.4f},{v + .05:.4f},{12 - i}")
    prior = tmp_path / "prior.csv"
    prior.write_text(
        "combo,val_median_AUROC,val_p2.5,val_p97.5,val_rank,"
        "test_median_AUROC,test_p2.5,test_p97.5,test_rank\n"
        + "\n".join(prior_rows) + "\n")
    monkeypatch.setattr(
        "sys.argv",
        ["analyze", "--output_dir", str(tmp_path), "--marker_prefix",
         "boot", "--compare_csv", str(prior)])
    analyze.main()
    outp = capsys.readouterr().out
    # identical orderings -> rho=1.000 on both lines
    assert "cross-protocol val-rank agreement" in outp
    assert "cross-protocol TEST-rank agreement" in outp
    for line in outp.splitlines():
        if "cross-protocol" in line:
            assert "rho=1.000" in line, line
    del rng


def test_out_csv_full_ranking(tmp_path, monkeypatch, capsys):
    """--out_csv writes one row per combo with val AND (optional) test
    ranks, in val-rank order."""
    state = tmp_path / "sweep_state"
    state.mkdir()
    (state / "e2e_1_2_3_5cv_100ep_4b_0.0001lr_42s_grid.json").write_text(
        json.dumps({"combo": [1, 2, 3], "val": _folds([0.6, 0.7, 0.8]),
                    "test": _folds([0.5, 0.55, 0.65])}))
    (state / "e2e_2_3_4_5cv_100ep_4b_0.0001lr_42s_grid.json").write_text(
        json.dumps({"combo": [2, 3, 4], "val": _folds([0.9, 0.9, 0.9]),
                    "test": None}))
    out_csv = tmp_path / "ranking.csv"
    monkeypatch.setattr(
        "sys.argv",
        ["analyze", "--output_dir", str(tmp_path),
         "--out_csv", str(out_csv)])
    analyze.main()
    lines = out_csv.read_text().strip().split("\n")
    assert lines[0] == ("combo,val_median_AUROC,val_p2.5,val_p97.5,"
                        "val_rank,test_median_AUROC,test_p2.5,test_p97.5,"
                        "test_rank")
    assert lines[1].startswith("2_3_4,0.9000,")        # val-rank 1
    assert lines[1].endswith(",1,,,,")                 # no test metrics
    cols = lines[2].split(",")
    assert cols[0] == "1_2_3" and cols[1] == "0.7000"
    assert cols[4] == "2" and cols[5] == "0.5500" and cols[8] == "1"
    # the band columns are the reference's 2.5/97.5 percentile idiom
    assert float(cols[2]) <= 0.7000 <= float(cols[3])


def test_markers_to_workbook(tmp_path, capsys):
    """tools/markers_to_workbook.py reassembles the reference-format
    Ensemble_* workbooks from resume markers — the deliverable path for a
    deadline-stopped sweep (round_end.sh step 3a)."""
    spec = importlib.util.spec_from_file_location(
        "markers_to_workbook",
        os.path.join(REPO, "tools", "markers_to_workbook.py"))
    m2w = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m2w)

    from vit3d_ensemble_tpu.reporting import REPORT_METRICS

    def full_folds(aurocs):
        # real markers carry all 11 REPORT_METRICS per replicate
        return {f"boot{i}": {m: a for m in REPORT_METRICS}
                for i, a in enumerate(aurocs)}

    state = tmp_path / "sweep_state"
    state.mkdir()
    (state / "boot_1_2_3_5rep_100ep_4b_0.0001lr_42s_grid.json").write_text(
        json.dumps({"combo": [1, 2, 3], "val": full_folds([0.6, 0.7]),
                    "test": full_folds([0.5, 0.55])}))
    (state / "boot_4_5_16_5rep_100ep_4b_0.0001lr_42s_grid.json").write_text(
        json.dumps({"combo": [4, 5, 16], "val": full_folds([0.9, 0.9]),
                    "test": None}))
    m2w.main(["--output_dir", str(tmp_path), "--marker_prefix", "boot",
              "--workbook", "Ensemble_Bootstrap"])
    val_csv = (tmp_path / "Ensemble_Bootstrap.csv").read_text().splitlines()
    assert val_csv[0].startswith("Ensemble,Specificity,")
    names = {row.split(",")[0] for row in val_csv[1:]}
    assert names == {"1_2_3", "4_5_16"}
    test_csv = (tmp_path / "Ensemble_Bootstrap_test.csv"
                ).read_text().splitlines()
    assert {row.split(",")[0] for row in test_csv[1:]} == {"1_2_3"}
    assert (tmp_path / "Ensemble_Bootstrap.xlsx").exists()
