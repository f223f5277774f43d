"""ChebyshevTT — tensor-train Chebyshev interpolation.

Placeholder module: full implementation lands in the TT stage.
"""

from __future__ import annotations

__all__ = ["ChebyshevTT"]


class ChebyshevTT:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("ChebyshevTT: implementation pending")
