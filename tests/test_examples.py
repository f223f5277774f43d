"""Every shipped example must run end-to-end on the CPU test backend.

Keeps the runnable documentation honest: an API change that breaks an
example fails CI here, not in a user's terminal.  (~1 min total; the
conftest's 8 virtual devices cover the multi-chip demo.)
"""

import importlib
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples")

EXAMPLES = [
    "black_scholes_5d",
    "spline_kink_2d",
    "tensor_train_5d",
    "slider_10d",
    "portfolio_proxy",
    "calibration_autodiff",
    "serving_engine",
    "greek_report",
    "near_f64_tiers",
    "interconversion",
    "scenario_calculus",
    "global_calculus",
    "fit_scattered",
    "multi_chip",
    "fdm_baseline",
    "compressed_serving",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, capsys):
    sys.path.insert(0, EXAMPLES_DIR)
    try:
        mod = importlib.import_module(name)
        mod.main()
    finally:
        sys.path.remove(EXAMPLES_DIR)
    out = capsys.readouterr().out
    assert out.strip(), f"{name}.main() produced no output"
    assert "nan" not in out.lower().replace("nan_guard", "")