"""Independent stdlib-Python .pcb reader: fixture round-trips, evaluation
agreement with the library, and the synthetic-byte corruption matrix
(the counterpart of the reference Rust crate's lib.rs tests)."""

import importlib.util
import io
import math
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")
READER = os.path.join(REPO, "readers", "pystdlib", "pcbreader.py")

spec = importlib.util.spec_from_file_location("pcbreader", READER)
pcbreader = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pcbreader)


def fixture_bytes(name):
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


# --- synthetic minimal files -----------------------------------------------


def synth_approx(d=1, lo=(-1.0,), hi=(1.0,), n=(3,), values=None,
                 magic=b"PCB\x00", major=1, minor=0, tag=1,
                 reserved=b"\x00" * 4):
    total = 1
    for x in n:
        total *= x
    if values is None:
        values = [float(i) for i in range(total)]
    out = io.BytesIO()
    out.write(magic + struct.pack("<BBH", major, minor, tag) + reserved)
    out.write(struct.pack("<I", d))
    out.write(struct.pack(f"<{d}d", *lo))
    out.write(struct.pack(f"<{d}d", *hi))
    out.write(struct.pack(f"<{d}I", *n))
    out.write(struct.pack(f"<{len(values)}d", *values))
    return out.getvalue()


class TestFixtures:
    def test_approx_2d(self):
        obj = pcbreader.read_pcb_from_bytes(
            fixture_bytes("approx_2d_simple.pcb"))
        assert isinstance(obj, pcbreader.Approximation)
        assert obj.num_dimensions == 2
        assert len(obj.tensor_values) == math.prod(obj.n_nodes)

    def test_approx_5d(self):
        obj = pcbreader.read_pcb(
            os.path.join(FIXTURES, "approx_5d_bs.pcb"))
        assert obj.num_dimensions == 5
        assert obj.n_nodes == [11] * 5 or len(obj.n_nodes) == 5

    def test_spline_1d(self):
        obj = pcbreader.read_pcb_from_bytes(
            fixture_bytes("spline_1d_kink.pcb"))
        assert isinstance(obj, pcbreader.Spline)
        assert len(obj.pieces) == math.prod(
            len(k) + 1 for k in obj.knots)


class TestEvaluationAgreement:
    """The independent evaluator must agree with the library to ~1e-14."""

    def test_approx_5d_eval(self):
        from pychebyshev_tpu import ChebyshevApproximation
        path = os.path.join(FIXTURES, "approx_5d_bs.pcb")
        lib = ChebyshevApproximation.load(path)
        ours = pcbreader.read_pcb(path)
        rng = np.random.default_rng(0)
        lo = np.array(ours.domain_lo)
        hi = np.array(ours.domain_hi)
        for _ in range(10):
            pt = list(lo + (hi - lo) * rng.uniform(0.05, 0.95, 5))
            a = ours.evaluate(pt)
            b = lib.vectorized_eval(pt, [0] * 5)
            assert abs(a - b) <= 1e-12 * max(1.0, abs(b))

    def test_exact_node_hit(self):
        from pychebyshev_tpu import ChebyshevApproximation
        path = os.path.join(FIXTURES, "approx_2d_simple.pcb")
        lib = ChebyshevApproximation.load(path)
        ours = pcbreader.read_pcb(path)
        node0 = ours._nodes[0][1]
        node1 = ours._nodes[1][2]
        a = ours.evaluate([node0, node1])
        b = lib.vectorized_eval([node0, node1], [0, 0])
        assert abs(a - b) <= 1e-13 * max(1.0, abs(b))

    def test_spline_routing(self):
        from pychebyshev_tpu import ChebyshevSpline
        path = os.path.join(FIXTURES, "spline_1d_kink.pcb")
        lib = ChebyshevSpline.load(path)
        ours = pcbreader.read_pcb(path)
        for x in [-0.9, -0.3, 0.0, 0.2, 0.8]:
            a = ours.evaluate([x])
            b = lib.eval([x], [0])
            assert abs(a - b) <= 1e-12 * max(1.0, abs(b))


class TestCorruptionMatrix:
    def _reject(self, data, kind):
        with pytest.raises(pcbreader.PcbError) as exc:
            pcbreader.read_pcb_from_bytes(data)
        assert exc.value.kind == kind, exc.value

    def test_valid_minimal(self):
        obj = pcbreader.read_pcb_from_bytes(synth_approx())
        assert obj.n_nodes == [3]

    def test_invalid_magic(self):
        self._reject(synth_approx(magic=b"XPCB"), "InvalidMagic")

    def test_unsupported_major(self):
        self._reject(synth_approx(major=9), "UnsupportedVersion")

    def test_nonzero_reserved(self):
        self._reject(synth_approx(reserved=b"\x00\x01\x00\x00"),
                     "NonzeroReserved")

    def test_unknown_class_tag(self):
        self._reject(synth_approx(tag=7), "UnknownClassTag")

    def test_truncation_everywhere(self):
        full = synth_approx()
        # every proper prefix must fail with Truncated (never crash,
        # never succeed)
        for cut in range(len(full)):
            self._reject(full[:cut], "Truncated")

    def test_trailing_garbage(self):
        self._reject(synth_approx() + b"\x00", "InvalidField")

    def test_zero_dimensions(self):
        raw = synth_approx()
        # d field sits right after the 12-byte header
        bad = raw[:12] + struct.pack("<I", 0) + raw[16:]
        self._reject(bad, "InvalidField")

    def test_inverted_domain(self):
        self._reject(synth_approx(lo=(1.0,), hi=(-1.0,)), "InvalidField")

    def test_zero_n_nodes(self):
        bad = synth_approx(n=(0,), values=[])
        self._reject(bad, "InvalidField")

    def test_element_cap(self):
        # two dims whose product overflows the cap; body intentionally
        # short — the cap must trip before any huge read is attempted
        out = io.BytesIO()
        out.write(b"PCB\x00" + struct.pack("<BBH", 1, 0, 1) + b"\x00" * 4)
        out.write(struct.pack("<I", 2))
        out.write(struct.pack("<2d", -1.0, -1.0))
        out.write(struct.pack("<2d", 1.0, 1.0))
        out.write(struct.pack("<2I", 100_000, 100_000))
        self._reject(out.getvalue(), "InvalidField")

    def test_unsorted_knots(self):
        out = io.BytesIO()
        out.write(b"PCB\x00" + struct.pack("<BBH", 1, 0, 2) + b"\x00" * 4)
        out.write(struct.pack("<I", 1))
        out.write(struct.pack("<d", -1.0))
        out.write(struct.pack("<d", 1.0))
        out.write(struct.pack("<I", 3))
        out.write(struct.pack("<I", 2))
        out.write(struct.pack("<2d", 0.5, -0.5))
        self._reject(out.getvalue(), "InvalidField")

    def test_piece_count_mismatch(self):
        out = io.BytesIO()
        out.write(b"PCB\x00" + struct.pack("<BBH", 1, 0, 2) + b"\x00" * 4)
        out.write(struct.pack("<I", 1))
        out.write(struct.pack("<d", -1.0))
        out.write(struct.pack("<d", 1.0))
        out.write(struct.pack("<I", 3))
        out.write(struct.pack("<I", 1))
        out.write(struct.pack("<d", 0.0))
        out.write(struct.pack("<I", 5))  # knots imply 2
        self._reject(out.getvalue(), "InvalidField")


class TestRoundTripWithLibrary:
    """Files written by the library parse + evaluate identically."""

    def test_library_writes_reader_reads(self, tmp_path):
        from pychebyshev_tpu import ChebyshevApproximation
        cheb = ChebyshevApproximation(
            lambda x, _: math.sin(x[0]) * x[1], 2,
            [[-2.0, 2.0], [0.0, 1.0]], [9, 7])
        cheb.build(verbose=False)
        p = tmp_path / "rt.pcb"
        cheb.save(str(p), format="binary")
        obj = pcbreader.read_pcb(str(p))
        assert obj.n_nodes == [9, 7]
        pt = [0.37, 0.61]
        assert abs(obj.evaluate(pt)
                   - cheb.vectorized_eval(pt, [0, 0])) < 1e-13


class TestCli:
    def test_cli_eval(self):
        path = os.path.join(FIXTURES, "approx_2d_simple.pcb")
        out = subprocess.run(
            [sys.executable, READER, path, "0.25", "0.5"],
            capture_output=True, text=True)
        assert out.returncode == 0
        float(out.stdout.strip())  # parses as a number

    def test_cli_wrong_arity(self):
        path = os.path.join(FIXTURES, "approx_2d_simple.pcb")
        out = subprocess.run([sys.executable, READER, path, "0.25"],
                             capture_output=True, text=True)
        assert out.returncode == 1
        assert "2-D" in out.stderr

    def test_cli_info(self):
        path = os.path.join(FIXTURES, "spline_1d_kink.pcb")
        out = subprocess.run([sys.executable, READER, path],
                             capture_output=True, text=True)
        assert out.returncode == 0
        assert "Spline" in out.stdout
