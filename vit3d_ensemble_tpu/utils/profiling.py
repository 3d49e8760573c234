"""Tracing / profiling hooks (SURVEY.md §5: absent in the reference — the
only instrumentation there is tqdm loss strings, `train_baseline_cv.py:
159-162`).

TPU-native equivalents:
  * `profile_to(dir)` — context manager around any driver section; writes a
    Perfetto/XProf trace viewable in TensorBoard or ui.perfetto.dev.  Every
    CLI driver exposes it via --profile_dir.
  * `step_annotation(name)` — jax.profiler StepTraceAnnotation so train
    steps show as named rows in the trace.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def profile_to(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into trace_dir (no-op when None)."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str, step: int):
    import jax

    return jax.profiler.StepTraceAnnotation(name, step_num=step)
