"""A/B bench: anchored vs root-restricting dense zero isolation.

Round-5 measurement for the `isolate_common_zeros` anchoring
(`ops/subdivision.py`): the gradient systems of oscillatory 31^3 and
25^4 interpolants (the `critical_points` production path), isolated
with the CURRENT working-tree implementation and, when ``--ab`` is
given, with the implementation at git HEAD loaded side-by-side — same
inputs, surviving boxes compared exactly.

CPU-only (isolation is host NumPy by design).  Run:
    python scripts/bench_zero_isolation.py [--ab] [--skip-4d]
"""

import argparse
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def _load_head_isolation(ref="r5-pre-anchor"):
    """Import the pre-anchor subdivision module (git ref
    ``r5-pre-anchor`` — the anchoring landed in the next commit, so
    plain HEAD would compare the anchored code to itself)."""
    import importlib.util

    src = subprocess.run(
        ["git", "show",
         f"{ref}:pychebyshev_tpu/ops/subdivision.py"],
        check=True, capture_output=True, text=True,
        cwd=Path(__file__).resolve().parent.parent).stdout
    tmp = tempfile.NamedTemporaryFile(
        "w", suffix="_subdivision_head.py", delete=False)
    tmp.write(src)
    tmp.close()
    spec = importlib.util.spec_from_file_location(
        "subdivision_head", tmp.name)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _grad_system(n, d, freq):
    """Gradient coefficient tensors of an oscillatory d-D interpolant
    with many interior critical points."""
    from pychebyshev_tpu import ChebyshevApproximation
    from pychebyshev_tpu.utils.globalcalc import (
        _grad_specs,
        dense_coeff_tensor,
    )

    def f(pts, _data=None):
        x = np.asarray(pts)
        out = np.ones(x.shape[0])
        for k in range(d):
            out = out * np.cos(freq * x[..., k] + 0.3 * k)
        return out + 0.05 * np.sum(x, axis=-1)

    c = ChebyshevApproximation(f, d, [[-1.0, 1.0]] * d,
                               n_nodes=[n] * d, vectorized=True)
    c.build(verbose=False)
    return [dense_coeff_tensor(c.differentiate(spec).tensor_values)
            for spec in _grad_specs(d)]


def _run(tag, fn, coeffs, delta, max_boxes):
    t0 = time.perf_counter()
    out = fn(coeffs, delta=delta, max_boxes=max_boxes)
    dt = time.perf_counter() - t0
    print(f"  {tag:10s} {dt:8.2f} s   {out.shape[0]} boxes")
    return dt, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ab", action="store_true",
                    help="also run git HEAD's implementation")
    ap.add_argument("--skip-4d", action="store_true")
    args = ap.parse_args()

    from pychebyshev_tpu.ops.subdivision import isolate_common_zeros
    head = _load_head_isolation() if args.ab else None

    cases = [("31^3 grad system", 31, 3, 6.0, 1e-3, 200000)]
    if not args.skip_4d:
        cases.append(("25^4 grad system", 25, 4, 3.0, 1e-2, 400000))

    for name, n, d, freq, delta, max_boxes in cases:
        print(f"{name} (delta={delta}):")
        coeffs = _grad_system(n, d, freq)
        print(f"  component size {coeffs[0].size}, K={len(coeffs)}")
        t_new, out_new = _run("anchored", isolate_common_zeros, coeffs,
                              delta, max_boxes)
        if head is not None:
            t_old, out_old = _run("HEAD", head.isolate_common_zeros,
                                  coeffs, delta, max_boxes)
            same = (out_new.shape == out_old.shape
                    and np.allclose(np.sort(out_new.ravel()),
                                    np.sort(out_old.ravel()),
                                    atol=delta))
            print(f"  speedup {t_old / t_new:5.2f}x   "
                  f"boxes identical: {same}")


if __name__ == "__main__":
    main()
