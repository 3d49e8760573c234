"""Durable sweep-state mirror (`sweep/state_mirror.py`).

A container reset destroys the run's --output_dir (it happened mid-sweep
once, costing a 228-combination partial run); the mirror keeps `--resume`
state inside the git worktree.  These tests cover the consolidation /
append / rehydrate cycle including the failure modes that motivated it:
junk marker files, truncated mirror lines, and a marker directory that
has been completely destroyed.
"""

import json
import os

from vit3d_ensemble_tpu.sweep.state_mirror import (
    append,
    read_mirror,
    restore,
    snapshot,
)


def _write_marker(state_dir, name, blob):
    os.makedirs(state_dir, exist_ok=True)
    with open(os.path.join(state_dir, name), "w") as f:
        json.dump(blob, f)


def test_snapshot_restore_roundtrip(tmp_path):
    state = str(tmp_path / "sweep_state")
    mirror = str(tmp_path / "mirror.jsonl")
    m1 = {"combo": [1, 2, 3], "val": {"CV 1": {"AUROC": 0.5}}}
    m2 = {"combo": [1, 2, 4], "val": {"CV 1": {"AUROC": 0.7}}}
    _write_marker(state, "e2e_1_2_3_fp.json", m1)
    _write_marker(state, "e2e_1_2_4_fp.json", m2)
    _write_marker(state, "e2e_junk_fp.json.tmp", {"ignored": 1})
    with open(os.path.join(state, "e2e_bad_fp.json"), "w") as f:
        f.write('{"truncated": ')        # mid-write at reset time

    assert snapshot(state, mirror) == 2

    # total destruction of the marker dir (the container-reset scenario)
    for p in os.listdir(state):
        os.remove(os.path.join(state, p))
    os.rmdir(state)

    assert restore(mirror, state) == 2
    with open(os.path.join(state, "e2e_1_2_3_fp.json")) as f:
        assert json.load(f) == m1
    with open(os.path.join(state, "e2e_1_2_4_fp.json")) as f:
        assert json.load(f) == m2
    # idempotent: existing files win, nothing rewritten
    assert restore(mirror, state) == 0


def test_append_last_wins_and_junk_lines(tmp_path):
    mirror = str(tmp_path / "mirror.jsonl")
    append(mirror, "e2e_a.json", {"v": 1})
    append(mirror, "e2e_a.json", {"v": 2})      # re-run overwrote marker
    append(mirror, "e2e_b.json", {"v": 3})
    with open(mirror, "a") as f:
        f.write('{"file": "e2e_c.json", "marker"')  # truncated by a reset
    got = read_mirror(mirror)
    assert got == {"e2e_a.json": {"v": 2}, "e2e_b.json": {"v": 3}}


def test_snapshot_keeps_mirror_only_entries(tmp_path):
    """A snapshot taken AFTER the marker dir was lost must not erase the
    mirror's knowledge (mirror-only entries are folded back in)."""
    state = str(tmp_path / "sweep_state")
    mirror = str(tmp_path / "mirror.jsonl")
    append(mirror, "e2e_old.json", {"v": "survives"})
    _write_marker(state, "e2e_new.json", {"v": "fresh"})
    assert snapshot(state, mirror) == 2
    got = read_mirror(mirror)
    assert got["e2e_old.json"] == {"v": "survives"}
    assert got["e2e_new.json"] == {"v": "fresh"}


def test_restore_missing_mirror_is_noop(tmp_path):
    assert restore(str(tmp_path / "absent.jsonl"),
                   str(tmp_path / "state")) == 0
