"""C++ .pcb reader/evaluator: build, unit tests, and Python<->C++
numerical agreement via the ctypes C ABI."""

import ctypes
import math
import os
import subprocess

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSpline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPP_DIR = os.path.join(REPO, "cpp")
FIXTURES = os.path.join(REPO, "tests", "fixtures")


@pytest.fixture(scope="session")
def cpp_build(tmp_path_factory):
    """Compile the C++ library + binaries once per session."""
    build = tmp_path_factory.mktemp("cpp_build")
    src = [os.path.join(CPP_DIR, f)
           for f in ("pcb_reader.cpp",)]
    flags = ["-std=c++17", "-O2", "-fPIC", "-Wall"]

    def run(cmd):
        subprocess.run(cmd, check=True, cwd=CPP_DIR,
                       capture_output=True, text=True)

    obj = str(build / "pcb_reader.o")
    run(["g++", *flags, "-c", src[0], "-o", obj])
    lib = str(build / "libpcb.so")
    run(["g++", *flags, "-shared",
         os.path.join(CPP_DIR, "pcb_capi.cpp"), obj, "-o", lib])
    test_bin = str(build / "test_pcb_reader")
    run(["g++", *flags, os.path.join(CPP_DIR, "test_pcb_reader.cpp"),
         obj, "-o", test_bin])
    cli = str(build / "pcb_eval")
    run(["g++", *flags, os.path.join(CPP_DIR, "pcb_eval_main.cpp"),
         obj, "-o", cli])
    return {"lib": lib, "test_bin": test_bin, "cli": cli}


@pytest.fixture(scope="session")
def fixtures_dir():
    """Generate the committed fixture set if missing."""
    if not os.path.exists(os.path.join(FIXTURES, "approx_5d_bs.pcb")):
        subprocess.run(
            ["python", os.path.join(REPO, "scripts",
                                    "generate_test_fixtures.py")],
            check=True, capture_output=True)
    return FIXTURES


@pytest.fixture(scope="session")
def libpcb(cpp_build):
    lib = ctypes.CDLL(cpp_build["lib"])
    lib.pcb_load.restype = ctypes.c_void_p
    lib.pcb_load.argtypes = [ctypes.c_char_p]
    lib.pcb_free.argtypes = [ctypes.c_void_p]
    lib.pcb_class_tag.argtypes = [ctypes.c_void_p]
    lib.pcb_num_dimensions.argtypes = [ctypes.c_void_p]
    lib.pcb_eval.restype = ctypes.c_int
    lib.pcb_eval.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_double),
                             ctypes.c_int,
                             ctypes.POINTER(ctypes.c_double)]
    lib.pcb_eval_batch.restype = ctypes.c_int
    lib.pcb_eval_batch.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_double),
                                   ctypes.c_int, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_double)]
    lib.pcb_last_error.restype = ctypes.c_char_p
    return lib


def _cpp_eval(lib, handle, point):
    arr = (ctypes.c_double * len(point))(*point)
    out = ctypes.c_double()
    rc = lib.pcb_eval(handle, arr, len(point), ctypes.byref(out))
    assert rc == 0, lib.pcb_last_error().decode()
    return out.value


class TestUnitBinary:
    def test_cpp_unit_tests_pass(self, cpp_build, fixtures_dir):
        result = subprocess.run([cpp_build["test_bin"], fixtures_dir],
                                capture_output=True, text=True)
        assert result.returncode == 0, result.stderr
        assert "all tests passed" in result.stdout


class TestCtypesAgreement:
    def test_approx_roundtrip(self, libpcb, tmp_path):
        cheb = ChebyshevApproximation(
            lambda x, _: math.sin(x[0]) * math.exp(x[1]), 2,
            [[-1, 1], [0, 2]], [9, 11])
        cheb.build(verbose=False)
        path = tmp_path / "a.pcb"
        cheb.save(path, format="binary")

        handle = libpcb.pcb_load(str(path).encode())
        assert handle, libpcb.pcb_last_error().decode()
        try:
            assert libpcb.pcb_class_tag(handle) == 1
            assert libpcb.pcb_num_dimensions(handle) == 2
            rng = np.random.default_rng(1)
            pts = np.column_stack([rng.uniform(-1, 1, 20),
                                   rng.uniform(0, 2, 20)])
            py_vals = cheb.vectorized_eval_batch(pts, [0, 0])
            for pt, expected in zip(pts, py_vals):
                got = _cpp_eval(libpcb, handle, list(pt))
                assert abs(got - expected) < 1e-12 * max(1, abs(expected))
        finally:
            libpcb.pcb_free(handle)

    def test_approx_exact_node(self, libpcb, tmp_path):
        cheb = ChebyshevApproximation(
            lambda x, _: x[0] ** 3, 1, [[-2, 2]], [7])
        cheb.build(verbose=False)
        path = tmp_path / "n.pcb"
        cheb.save(path, format="binary")
        handle = libpcb.pcb_load(str(path).encode())
        try:
            node = float(np.asarray(cheb.nodes[0])[2])
            got = _cpp_eval(libpcb, handle, [node])
            expected = float(np.asarray(cheb.tensor_values)[2])
            assert got == expected
        finally:
            libpcb.pcb_free(handle)

    def test_spline_roundtrip(self, libpcb, tmp_path):
        sp = ChebyshevSpline(lambda x, _: abs(x[0]) * (1 + 0.5 * x[1]), 2,
                             [[-1, 1], [0, 1]], [9, 7], [[0.0], []])
        sp.build(verbose=False)
        path = tmp_path / "s.pcb"
        sp.save(path, format="binary")
        handle = libpcb.pcb_load(str(path).encode())
        assert handle, libpcb.pcb_last_error().decode()
        try:
            assert libpcb.pcb_class_tag(handle) == 2
            rng = np.random.default_rng(2)
            pts = np.column_stack([rng.uniform(-1, 1, 20),
                                   rng.uniform(0, 1, 20)])
            for pt in pts:
                got = _cpp_eval(libpcb, handle, list(pt))
                expected = sp.eval(list(pt), [0, 0])
                assert abs(got - expected) < 1e-12 * max(1, abs(expected))
            # at the knot: routes right, matches Python routing
            got = _cpp_eval(libpcb, handle, [0.0, 0.5])
            expected = sp.eval([0.0, 0.5], [0, 0])
            assert abs(got - expected) < 1e-13
        finally:
            libpcb.pcb_free(handle)

    def test_eval_batch_capi(self, libpcb, tmp_path):
        cheb = ChebyshevApproximation(
            lambda x, _: x[0] + 2 * x[1], 2, [[-1, 1], [-1, 1]], [5, 5])
        cheb.build(verbose=False)
        path = tmp_path / "b.pcb"
        cheb.save(path, format="binary")
        handle = libpcb.pcb_load(str(path).encode())
        try:
            pts = np.random.default_rng(3).uniform(-1, 1, (10, 2))
            flat = np.ascontiguousarray(pts, dtype=np.float64)
            out = np.empty(10)
            rc = libpcb.pcb_eval_batch(
                handle,
                flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                10, 2,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            assert rc == 0
            expected = cheb.vectorized_eval_batch(pts, [0, 0])
            np.testing.assert_allclose(out, expected, atol=1e-13)
        finally:
            libpcb.pcb_free(handle)

    def test_load_errors(self, libpcb, tmp_path):
        bad = tmp_path / "bad.pcb"
        bad.write_bytes(b"NOPE" + b"\x00" * 20)
        handle = libpcb.pcb_load(str(bad).encode())
        assert not handle
        assert b"magic" in libpcb.pcb_last_error()


class TestCli:
    def test_cli_matches_python(self, cpp_build, fixtures_dir):
        path = os.path.join(fixtures_dir, "approx_2d_simple.pcb")
        cheb = ChebyshevApproximation.load(path)
        result = subprocess.run(
            [cpp_build["cli"], path, "0.25", "1.5"],
            capture_output=True, text=True, check=True)
        got = float(result.stdout.strip())
        expected = cheb.vectorized_eval([0.25, 1.5], [0, 0])
        assert abs(got - expected) < 1e-13

    def test_cli_spline(self, cpp_build, fixtures_dir):
        path = os.path.join(fixtures_dir, "spline_1d_kink.pcb")
        sp = ChebyshevSpline.load(path)
        result = subprocess.run([cpp_build["cli"], path, "-0.37"],
                                capture_output=True, text=True, check=True)
        got = float(result.stdout.strip())
        assert abs(got - sp.eval([-0.37], [0])) < 1e-13

    def test_cli_dim_mismatch(self, cpp_build, fixtures_dir):
        path = os.path.join(fixtures_dir, "approx_2d_simple.pcb")
        result = subprocess.run([cpp_build["cli"], path, "0.5"],
                                capture_output=True, text=True)
        assert result.returncode != 0
