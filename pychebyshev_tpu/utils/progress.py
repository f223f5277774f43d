"""Optional tqdm progress wrapper (active at verbose=2)."""

from __future__ import annotations

import warnings

__all__ = ["progress_iter"]


def progress_iter(iterable, total=None, enabled=False, desc=None):
    """Wrap *iterable* in a tqdm bar when ``enabled`` and tqdm is present.

    Falls back to the raw iterable (with a one-time warning) when tqdm is
    unavailable.
    """
    if not enabled:
        return iterable
    try:
        from tqdm import tqdm
    except ImportError:
        warnings.warn(
            "verbose=2 requested a progress bar but tqdm is not installed; "
            "continuing without one",
            UserWarning,
            stacklevel=2,
        )
        return iterable
    return tqdm(iterable, total=total, desc=desc)


def _maybe_progress(iterable, desc=None, verbose=False):
    """Reference-name compat alias: tqdm wrapper active at verbose=2."""
    return progress_iter(iterable, enabled=(verbose == 2), desc=desc)
