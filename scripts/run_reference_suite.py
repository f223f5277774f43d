"""Run the upstream PyChebyshev test corpus against THIS implementation.

Builds a scratch directory containing the reference repo's test files
plus a conftest that aliases ``pychebyshev`` (and its private modules)
to ``pychebyshev_tpu``, then runs pytest there.

Current score: 1166 / 1167 reference tests pass.  The single expected
failure (``test_v016_polish.py::TestClone::test_clone_tensor_isolation``)
mutates ``tensor_values`` element-wise in place — immutable device
arrays reject that by design (the immutability is what makes the
reference's dim-order race class unrepresentable).

Usage:  python scripts/run_reference_suite.py [pytest args...]
Requires the reference checkout at /root/reference (or set
PYCHEBYSHEV_REFERENCE).
"""

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("PYCHEBYSHEV_REFERENCE", "/root/reference")

CONFTEST_HEADER = '''\
import os, sys
os.environ["PYCHEBYSHEV_MP_CONTEXT"] = "fork"  # shim state must reach pool children
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

import pychebyshev_tpu
sys.modules['pychebyshev'] = pychebyshev_tpu
import pychebyshev_tpu.models.approximation as _m
sys.modules['pychebyshev.barycentric'] = _m
import pychebyshev_tpu.models.spline as _m2
sys.modules['pychebyshev.spline'] = _m2
import pychebyshev_tpu.models.tensor_train as _m3
sys.modules['pychebyshev.tensor_train'] = _m3
import pychebyshev_tpu.models.slider as _m4
sys.modules['pychebyshev.slider'] = _m4
sys.path.insert(0, {repo!r} + "/scripts")
import reference_compat_binary as _rcb
_b = _rcb.install()
sys.modules['pychebyshev._binary'] = _b
pychebyshev_tpu._binary = _b
import pychebyshev_tpu.utils.calculus as _c
sys.modules['pychebyshev._calculus'] = _c
import pychebyshev_tpu.utils.sensitivity as _s
sys.modules['pychebyshev._sensitivity'] = _s
import pychebyshev_tpu.utils.algebra as _a
sys.modules['pychebyshev._algebra'] = _a
import pychebyshev_tpu.utils.extrude_slice as _e
sys.modules['pychebyshev._extrude_slice'] = _e
import pychebyshev_tpu.utils.progress as _p
sys.modules['pychebyshev._progress'] = _p
import pychebyshev_tpu.utils.parallel_build as _pa
sys.modules['pychebyshev._parallel'] = _pa
import pychebyshev_tpu._version as _v
sys.modules['pychebyshev._version'] = _v

'''


def main() -> int:
    ref_tests = os.path.join(REFERENCE, "tests")
    if not os.path.isdir(ref_tests):
        print(f"reference tests not found at {ref_tests}; set "
              f"PYCHEBYSHEV_REFERENCE", file=sys.stderr)
        return 2

    workdir = tempfile.mkdtemp(prefix="pychebyshev_ref_suite_")
    try:
        for name in os.listdir(ref_tests):
            src = os.path.join(ref_tests, name)
            if name.startswith("test_") and name.endswith(".py"):
                shutil.copy(src, workdir)
            elif name == "fixtures":
                shutil.copytree(src, os.path.join(workdir, "fixtures"))

        conftest = CONFTEST_HEADER.format(repo=REPO)
        conftest += open(os.path.join(ref_tests, "conftest.py")).read()
        with open(os.path.join(workdir, "conftest.py"), "w") as f:
            f.write(conftest)

        cmd = [sys.executable, "-m", "pytest", workdir, "-q",
               "-p", "no:cacheprovider", *sys.argv[1:]]
        return subprocess.call(cmd)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
