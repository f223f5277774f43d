"""Shared fixtures: analytic Black-Scholes oracle + pre-built interpolants.

Environment: tests force the CPU backend with 8 virtual devices so the
multi-chip sharding paths compile and execute without TPU hardware (the
driver separately dry-runs the mesh path; real-chip benchmarking lives in
bench.py).  Must run before the first ``import jax`` anywhere.
"""

import os

# PYCHEBYSHEV_TPU_TESTS=1 keeps the real backend so the hardware gates
# in tests/test_tpu_hardware.py can run on an actual chip.
_keep_tpu = os.environ.get("PYCHEBYSHEV_TPU_TESTS") == "1"

if not _keep_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"  # env may preset a TPU platform
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

# The container's sitecustomize may have already registered a TPU plugin
# and pinned jax_platforms; the config value wins over the env var, so
# pin it back to CPU explicitly.
if not _keep_tpu:
    jax.config.update("jax_platforms", "cpu")

import math

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# Analytic Black-Scholes oracle (self-contained ground truth)
# ---------------------------------------------------------------------------

def _norm_cdf(x):
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _norm_pdf(x):
    return math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)


def bs_price(s, k, t, sigma, r):
    """European call price."""
    d1 = (math.log(s / k) + (r + 0.5 * sigma ** 2) * t) / (sigma * math.sqrt(t))
    d2 = d1 - sigma * math.sqrt(t)
    return s * _norm_cdf(d1) - k * math.exp(-r * t) * _norm_cdf(d2)


def bs_delta(s, k, t, sigma, r):
    d1 = (math.log(s / k) + (r + 0.5 * sigma ** 2) * t) / (sigma * math.sqrt(t))
    return _norm_cdf(d1)


def bs_gamma(s, k, t, sigma, r):
    d1 = (math.log(s / k) + (r + 0.5 * sigma ** 2) * t) / (sigma * math.sqrt(t))
    return _norm_pdf(d1) / (s * sigma * math.sqrt(t))


def bs_vega(s, k, t, sigma, r):
    d1 = (math.log(s / k) + (r + 0.5 * sigma ** 2) * t) / (sigma * math.sqrt(t))
    return s * _norm_pdf(d1) * math.sqrt(t)


def bs_price_vectorized(points, _data=None):
    """Batched BS price: points (N, 5) = (S, K, T, sigma, r) -> (N,)."""
    from scipy.stats import norm
    points = np.asarray(points, dtype=np.float64)
    s, k, t, sigma, r = (points[:, i] for i in range(5))
    sqrt_t = np.sqrt(t)
    d1 = (np.log(s / k) + (r + 0.5 * sigma ** 2) * t) / (sigma * sqrt_t)
    d2 = d1 - sigma * sqrt_t
    return s * norm.cdf(d1) - k * np.exp(-r * t) * norm.cdf(d2)


BS_DOMAIN_5D = [[80.0, 120.0], [90.0, 110.0], [0.25, 2.0],
                [0.1, 0.5], [0.01, 0.05]]
BS_POINT = [100.0, 100.0, 1.0, 0.2, 0.03]


# ---------------------------------------------------------------------------
# Fixtures
# ---------------------------------------------------------------------------

def sin_sum_3d(x, _):
    return math.sin(x[0]) + math.sin(x[1]) + math.sin(x[2])


@pytest.fixture(scope="session")
def cheb_sin3d():
    """3-D sin-sum interpolant, scalar (black-box) function protocol."""
    from pychebyshev_tpu import ChebyshevApproximation
    cheb = ChebyshevApproximation(
        sin_sum_3d, 3, [[-1, 1], [-1, 1], [-1, 1]], [11, 11, 11])
    cheb.build(verbose=False)
    return cheb


@pytest.fixture(scope="session")
def cheb_bs5d():
    """5-D Black-Scholes interpolant, 11 nodes/dim, vectorized build."""
    from pychebyshev_tpu import ChebyshevApproximation
    cheb = ChebyshevApproximation(
        bs_price_vectorized, 5, BS_DOMAIN_5D, [11] * 5, vectorized=True)
    cheb.build(verbose=False)
    return cheb


@pytest.fixture(scope="session")
def cheb_bs3d():
    """3-D Black-Scholes (S, T, sigma at fixed K=100, r=0.03)."""
    from pychebyshev_tpu import ChebyshevApproximation

    def f(x, _):
        return bs_price(x[0], 100.0, x[1], x[2], 0.03)

    cheb = ChebyshevApproximation(
        f, 3, [[80.0, 120.0], [0.25, 2.0], [0.1, 0.5]], [13, 13, 13])
    cheb.build(verbose=False)
    return cheb
