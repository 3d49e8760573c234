"""Diagnostic toggles (SURVEY.md §5 race detection/sanitizers row: nothing
to port — the reference is single-threaded; the JAX-native equivalents are
NaN checking and the interpret-mode Pallas path)."""

from __future__ import annotations


def enable_nan_checking() -> None:
    """Turn on jax_debug_nans: any NaN produced under jit raises with the
    offending primitive's location — the framework's sanitizer analogue."""
    import jax

    jax.config.update("jax_debug_nans", True)


def disable_nan_checking() -> None:
    import jax

    jax.config.update("jax_debug_nans", False)
