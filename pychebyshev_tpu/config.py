"""Global numerical configuration for pychebyshev-tpu.

The accuracy contract of this library (parity with the float64 NumPy
reference implementation to ~1e-12, and the fixed-f64 ``.pcb`` binary
format) requires float64 end-to-end.  JAX defaults to float32, so we
flip the x64 switch at import time, before any array is created.

TPU note: XLA:TPU executes f64 in software (multi-pass on the VPU / MXU),
which is slower than f32 but preserves the parity contract.  Throughput-
oriented call sites can opt into f32 explicitly via the ``precision``
arguments on batch-eval entry points (see ``ops.eval``).
"""

from __future__ import annotations

import jax

jax.config.update("jax_enable_x64", True)

#: Tolerance below which a query coordinate is considered to coincide
#: exactly with a Chebyshev node.  Matches the reference implementation
#: (see /root/reference/src/pychebyshev/barycentric.py:942 and friends).
NODE_COINCIDENCE_TOL = 1e-14
