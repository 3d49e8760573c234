"""Measure the REFERENCE's per-(combination, fold) ensemble training cost
(torch CPU, the oracle checkout) — the denominator for the flagship
816x5 e2e sweep comparison in docs/RESULTS.md.

One cell of `/root/reference/train_ensemble_cv.py:56-85` is 100 epochs x
18 steps (72 train rows, B=4) of Adam on a 3-backbone TransformerEnsemble
(collapsed-config members, defect D1 — what the reference actually
trains).  Eval epochs are EXCLUDED, so the projection is conservative.

    python benchmarks/reference_ensemble_cell.py [--steps 8]

Run on a quiet host: concurrent compile jobs inflate torch CPU timings.
"""

from __future__ import annotations

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()
    sys.path.insert(0, args.reference)

    import torch
    from models.modeling import TransformerEnsemble, VisionTransformer
    from tools import get_config

    torch.manual_seed(0)
    cfg = get_config(16, 3072, 8, 16, 16)   # collapsed mapping (D1)
    vits = [VisionTransformer(cfg, 128, zero_head=True, num_classes=1)
            for _ in range(3)]
    ens = TransformerEnsemble(*vits, in_features=1, n_classes=1)
    opt = torch.optim.Adam(ens.parameters(), lr=1e-4)
    crit = torch.nn.BCELoss()
    x = torch.randn(4, 1, 128, 128, 5)
    y = torch.rand(4, 1)

    def step():
        loss = crit(ens(x), y)
        loss.backward()
        opt.step()
        opt.zero_grad()

    step()                                   # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = (time.perf_counter() - t0) / args.steps

    steps_per_cell = 18 * 100                # 72 rows / B=4 x 100 epochs
    cell_s = dt * steps_per_cell
    print(f"reference ensemble train step (B=4, 3 backbones, torch CPU): "
          f"{dt * 1e3:.0f} ms")
    print(f"per (combo, fold) cell: {cell_s / 60:.1f} min; "
          f"4080 cells = {cell_s * 4080 / 86400:.1f} days")


if __name__ == "__main__":
    main()
