"""pychebyshev-tpu: TPU-native multi-dimensional Chebyshev tensor
interpolation (JAX / XLA / Pallas).

A from-scratch reimplementation of the PyChebyshev capability surface —
full-tensor barycentric interpolation with analytical derivatives,
piecewise splines with kink knots, tensor-train compression, additive
sliders, interpolant calculus and algebra, and the portable ``.pcb``
binary format — designed TPU-first: float64 device arrays, jitted fused
contraction kernels, batched DCT transforms, and device-mesh sharding
for builds and giant query batches.

Example
-------
>>> import math
>>> from pychebyshev_tpu import ChebyshevApproximation
>>> def f(x, _):
...     return math.sin(x[0]) + math.sin(x[1])
>>> cheb = ChebyshevApproximation(f, 2, [[-1, 1], [-1, 1]], [11, 11])
>>> cheb.build(verbose=False)
>>> round(cheb.vectorized_eval([0.5, 0.3], [0, 0]), 4)
0.7764
"""

from __future__ import annotations

from dataclasses import dataclass

import pychebyshev_tpu.config  # noqa: F401  (enables x64 before anything else)

from pychebyshev_tpu._version import __version__
from pychebyshev_tpu.models.approximation import ChebyshevApproximation
from pychebyshev_tpu.models.spline import ChebyshevSpline
from pychebyshev_tpu.models.slider import ChebyshevSlider
from pychebyshev_tpu.models.tensor_train import ChebyshevTT
from pychebyshev_tpu.utils.globalcalc import CriticalPoint, solve_system


@dataclass(frozen=True)
class Domain:
    """Typed container for an interpolant's per-dimension bounds.

    Equivalent to a raw ``list[tuple[float, float]]``; accepted by all
    four interpolant constructors.
    """

    bounds: list


@dataclass(frozen=True)
class Ns:
    """Typed container for per-dimension node counts (``list[int]``)."""

    counts: list


@dataclass(frozen=True)
class SpecialPoints:
    """Typed container for per-dimension kink/knot locations
    (``list[list[float]]``)."""

    knots_per_dim: list


__all__ = [
    "ChebyshevApproximation",
    "ChebyshevSlider",
    "ChebyshevSpline",
    "ChebyshevTT",
    "CriticalPoint",
    "Domain",
    "Ns",
    "SpecialPoints",
    "solve_system",
    "__version__",
]
