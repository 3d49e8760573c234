"""Synthesize the sweep workbooks (<base>.{csv,xlsx} + <base>_test.*)
directly from per-combination resume markers.

The grid drivers (`train_ensemble_cv` grid mode, `train_ensemble_bootstrap`
grid mode) write their Ensemble_* workbooks only at the end of a fully
completed main() (reference deliverable shape:
/root/reference/train_ensemble_bootstrap.py:256-276).  A deadline-stopped
sweep leaves the per-combination markers — the durable source of truth the
analyzer and `--resume` already consume — but no workbook.  This tool
closes that gap: it reassembles `write_sweep_report`'s input from the
markers so the reference-format deliverable exists for the completed
subset.  Pure host work; safe while a sweep is running (markers are
written atomically).

    python tools/markers_to_workbook.py --output_dir /root/outputs/full_boot \
        --marker_prefix boot --workbook Ensemble_Bootstrap
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from analyze_e2e_sweep import load_markers  # noqa: E402

from vit3d_ensemble_tpu.reporting import write_sweep_report  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--marker_prefix", default="boot",
                   help="e2e (CV grid) or boot (bootstrap grid)")
    p.add_argument("--workbook", default="Ensemble_Bootstrap",
                   help="output base name (suffix _test added for the "
                        "held-out-test workbook)")
    args = p.parse_args(argv)
    val, test, _legacy = load_markers(args.output_dir, args.marker_prefix)
    if not val:
        raise SystemExit(f"no {args.marker_prefix}_* markers under "
                         f"{args.output_dir}/sweep_state")
    base = os.path.join(args.output_dir, args.workbook)
    write_sweep_report(base, val)
    if test:
        write_sweep_report(base + "_test", test)
    print(f"{len(val)} combinations ({len(test)} with test) -> "
          f"{base}{{,_test}}.xlsx/.csv")
    return 0


if __name__ == "__main__":
    sys.exit(main())
