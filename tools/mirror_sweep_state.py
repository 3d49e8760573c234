"""Mirror e2e-sweep resume markers into (or out of) a durable JSONL.

`/root/outputs` dies with the container; the git worktree survives.  Run
this periodically while a long sweep runs so its `--resume` state can be
rehydrated after a reset:

    # consolidate markers -> in-repo mirror (atomic, idempotent)
    python tools/mirror_sweep_state.py \
        --state_dir /root/outputs/full_e2e/sweep_state \
        --mirror docs/sweep_mirror_r4.jsonl

    # after a reset: rehydrate the marker dir, then --resume the sweep
    python tools/mirror_sweep_state.py --restore \
        --state_dir /root/outputs/full_e2e/sweep_state \
        --mirror docs/sweep_mirror_r4.jsonl

    # keep mirroring every 5 minutes until killed
    python tools/mirror_sweep_state.py --watch 300 ...

See also `train_ensemble_cv --state_mirror PATH`, which maintains the
mirror inline (append per completed combination + restore on --resume).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vit3d_ensemble_tpu.sweep.state_mirror import restore, snapshot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state_dir",
                    default="/root/outputs/full_e2e/sweep_state")
    ap.add_argument("--mirror", default="docs/sweep_mirror_r4.jsonl")
    ap.add_argument("--restore", action="store_true",
                    help="rehydrate the marker dir from the mirror "
                         "(default direction is markers -> mirror)")
    ap.add_argument("--watch", type=int, default=0, metavar="SECONDS",
                    help="re-snapshot every SECONDS until killed")
    args = ap.parse_args()

    if args.restore:
        n = restore(args.mirror, args.state_dir)
        print(f"restored {n} marker(s) into {args.state_dir}")
        return
    while True:
        n = snapshot(args.state_dir, args.mirror)
        print(f"{time.strftime('%H:%M:%S')} mirrored {n} marker(s) "
              f"-> {args.mirror}", flush=True)
        if not args.watch:
            break
        time.sleep(args.watch)


if __name__ == "__main__":
    main()
