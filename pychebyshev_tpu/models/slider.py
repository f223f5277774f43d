"""ChebyshevSlider — additive (sliding-technique) decomposition.

Placeholder module: full implementation lands in the slider stage.
"""

from __future__ import annotations

__all__ = ["ChebyshevSlider"]


class ChebyshevSlider:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("ChebyshevSlider: implementation pending")
