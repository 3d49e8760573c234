"""benchmarks/grid_dropout_deviation.py: marker loading + combo choice.

The deviation benchmark quantifies the e2e grid's dropout-stream deviation
(grid slot-sort renames module paths, so dropout draws differ from the
sequential ordering).  Its marker loader must read both marker schemas,
and the combo sample must be reproducible via --combos.
"""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "grid_dropout_deviation",
    os.path.join(REPO, "benchmarks", "grid_dropout_deviation.py"))
dev = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(dev)


def _folds(aurocs):
    return {f"CV {i + 1}": {"AUROC": a} for i, a in enumerate(aurocs)}


def test_load_markers_both_schemas(tmp_path):
    state = tmp_path / "sweep_state"
    state.mkdir()
    (state / "e2e_1_2_3_5cv_100ep_4b_0.0001lr_42s_grid.json").write_text(
        json.dumps({"combo": [1, 2, 3], "fingerprint": "x",
                    "val": _folds([0.6, 0.7]), "test": None}))
    (state / "e2e_5_9_11_5cv_100ep_4b_0.0001lr_42s.json").write_text(
        json.dumps(_folds([0.4, 0.5])))           # legacy val-only blob
    (state / "e2e_9_9_9_5cv.json").write_text("[]")  # junk shape: skipped

    out = dev.load_markers(str(tmp_path))
    assert set(out) == {"1_2_3", "5_9_11"}
    # name comes from the filename in both schemas (split at the
    # "_{num_cv}cv" fingerprint boundary)
    assert out["1_2_3"]["CV 1"]["AUROC"] == 0.6
    assert out["5_9_11"]["CV 2"]["AUROC"] == 0.5
