"""Perl .pcb reader: fixture evaluation agreement + corruption probes.

The Perl reader is the fourth independent consumer of the byte
contract (C++ library, C99 minireader, stdlib-Python, Perl)."""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")
READER = os.path.join(REPO, "readers", "perl", "pcbreader.pl")

pytestmark = pytest.mark.skipif(shutil.which("perl") is None,
                                reason="perl not available")


def run_reader(*args):
    return subprocess.run(["perl", READER, *args],
                          capture_output=True, text=True)


class TestEvaluation:
    def test_info(self):
        out = run_reader(os.path.join(FIXTURES, "approx_5d_bs.pcb"))
        assert out.returncode == 0
        assert out.stdout.startswith("Approximation: d=5")

    def test_approx_agrees_with_library(self):
        from pychebyshev_tpu import ChebyshevApproximation
        path = os.path.join(FIXTURES, "approx_5d_bs.pcb")
        lib = ChebyshevApproximation.load(path)
        rng = np.random.default_rng(3)
        lo = np.array([b[0] for b in lib.domain])
        hi = np.array([b[1] for b in lib.domain])
        for _ in range(5):
            pt = lo + (hi - lo) * rng.uniform(0.05, 0.95, 5)
            out = run_reader(path, *[repr(float(x)) for x in pt])
            assert out.returncode == 0, out.stderr
            got = float(out.stdout)
            want = lib.vectorized_eval(list(pt), [0] * 5)
            assert abs(got - want) <= 1e-12 * max(1.0, abs(want))

    def test_spline_routing_and_kink(self):
        from pychebyshev_tpu import ChebyshevSpline
        path = os.path.join(FIXTURES, "spline_1d_kink.pcb")
        lib = ChebyshevSpline.load(path)
        for x in [-0.7, -0.1, 0.3, 0.9]:
            out = run_reader(path, repr(x))
            assert out.returncode == 0, out.stderr
            want = lib.eval([x], [0])
            assert abs(float(out.stdout) - want) <= 1e-12

    def test_wrong_arity(self):
        out = run_reader(os.path.join(FIXTURES, "approx_2d_simple.pcb"),
                         "0.5")
        assert out.returncode == 1
        assert "2-D" in out.stderr


class TestCorruption:
    def _reject(self, tmp_path, data, kind):
        p = tmp_path / "bad.pcb"
        p.write_bytes(data)
        out = run_reader(str(p))
        assert out.returncode == 1
        assert kind in out.stderr, out.stderr

    def test_bad_magic(self, tmp_path):
        self._reject(tmp_path, b"XXXX" + b"\x00" * 30, "InvalidMagic")

    def test_bad_version(self, tmp_path):
        raw = b"PCB\x00" + struct.pack("<BBH", 9, 0, 1) + b"\x00" * 4
        self._reject(tmp_path, raw + b"\x00" * 8, "UnsupportedVersion")

    def test_nonzero_reserved(self, tmp_path):
        raw = b"PCB\x00" + struct.pack("<BBH", 1, 0, 1) + b"\x01\x00\x00\x00"
        self._reject(tmp_path, raw, "NonzeroReserved")

    def test_unknown_tag(self, tmp_path):
        raw = b"PCB\x00" + struct.pack("<BBH", 1, 0, 9) + b"\x00" * 4
        self._reject(tmp_path, raw + struct.pack("<I", 1), "UnknownClassTag")

    def test_truncated(self, tmp_path):
        with open(os.path.join(FIXTURES, "approx_2d_simple.pcb"),
                  "rb") as f:
            raw = f.read()
        self._reject(tmp_path, raw[:30], "Truncated")

    def test_trailing_bytes(self, tmp_path):
        with open(os.path.join(FIXTURES, "approx_2d_simple.pcb"),
                  "rb") as f:
            raw = f.read()
        self._reject(tmp_path, raw + b"\x00", "InvalidField")
