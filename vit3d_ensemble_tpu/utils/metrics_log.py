"""Structured metrics logging: JSON-lines event stream per run.

SURVEY.md §5 observability: the reference's only signals are tqdm strings
and terminal prints; the TPU build's contract is structured metrics.  Every
CLI driver appends evaluation/selection events to
`<output_dir>/metrics.jsonl`, one JSON object per line — trivially loadable
with pandas.read_json(lines=True).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)),
                        exist_ok=True)

    def log(self, event: str, **fields: Any) -> None:
        if not self.path:
            return
        record: Dict[str, Any] = {"ts": time.time(), "event": event}
        record.update(fields)
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")


def default_logger(output_dir: Optional[str]) -> MetricsLogger:
    return MetricsLogger(
        os.path.join(output_dir, "metrics.jsonl") if output_dir else None)
