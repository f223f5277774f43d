"""Drive the standalone C99 ``.pcb`` reader (examples/c_reader).

Covers the reference's C example-reader contract (reference
``examples/binary_reader/reader.c``): build with any C toolchain, parse
an Approximation ``.pcb``, evaluate, print ``%.17g`` matching the
Python evaluator.
"""

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
SRC_DIR = ROOT / "examples" / "c_reader"
FIXTURES = ROOT / "tests" / "fixtures"

cc = shutil.which("cc") or shutil.which("gcc")
pytestmark = pytest.mark.skipif(cc is None, reason="no C compiler")


@pytest.fixture(scope="module")
def minireader(tmp_path_factory):
    exe = tmp_path_factory.mktemp("c_reader") / "pcb_minireader"
    subprocess.run(
        [cc, "-std=c99", "-O2", "-o", str(exe),
         str(SRC_DIR / "pcb_minireader.c"), "-lm"],
        check=True)
    return exe


def _run(exe, *args, stdin=None):
    return subprocess.run([str(exe), *map(str, args)], input=stdin,
                          capture_output=True, text=True)


class TestEvaluate:
    @pytest.mark.parametrize("name", ["approx_2d_simple", "approx_5d_bs"])
    def test_matches_expected_fixture_values(self, minireader, name):
        pcb = FIXTURES / f"{name}.pcb"
        for line in (FIXTURES / f"{name}.expected").read_text().splitlines():
            *coords, expected = map(float, line.split())
            r = _run(minireader, pcb, *coords)
            assert r.returncode == 0, r.stderr
            got = float(r.stdout)
            assert abs(got - expected) < 1e-12 * max(1.0, abs(expected))

    def test_batch_stdin_mode(self, minireader):
        pcb = FIXTURES / "approx_5d_bs.pcb"
        lines = (FIXTURES / "approx_5d_bs.expected").read_text().splitlines()
        stdin = "\n".join(" ".join(l.split()[:-1]) for l in lines) + "\n"
        r = _run(minireader, pcb, "-", stdin=stdin)
        assert r.returncode == 0, r.stderr
        got = [float(v) for v in r.stdout.split()]
        expected = [float(l.split()[-1]) for l in lines]
        assert len(got) == len(expected)
        for g, e in zip(got, expected):
            assert abs(g - e) < 1e-12 * max(1.0, abs(e))

    def test_info_dump(self, minireader):
        r = _run(minireader, FIXTURES / "approx_5d_bs.pcb", "--info")
        assert r.returncode == 0
        assert "dimensions: 5" in r.stdout
        assert "tensor values: 7776" in r.stdout


class TestErrors:
    def test_wrong_coordinate_count(self, minireader):
        r = _run(minireader, FIXTURES / "approx_5d_bs.pcb", 1.0, 2.0)
        assert r.returncode == 1
        assert "expected 5 coordinates" in r.stderr

    def test_non_numeric_coordinate(self, minireader):
        r = _run(minireader, FIXTURES / "approx_2d_simple.pcb", 0.5, "zzz")
        assert r.returncode == 1
        assert "not a number" in r.stderr

    def test_spline_class_rejected(self, minireader):
        r = _run(minireader, FIXTURES / "spline_1d_kink.pcb", 0.5)
        assert r.returncode == 1
        assert "class_tag" in r.stderr

    def test_truncated_file(self, minireader, tmp_path):
        data = (FIXTURES / "approx_2d_simple.pcb").read_bytes()
        bad = tmp_path / "trunc.pcb"
        bad.write_bytes(data[: len(data) // 2])
        r = _run(minireader, bad, 0.5, 0.5)
        assert r.returncode == 1
        assert "end of file" in r.stderr

    def test_bad_magic(self, minireader, tmp_path):
        bad = tmp_path / "bad.pcb"
        bad.write_bytes(b"NOPE" + b"\x00" * 64)
        r = _run(minireader, bad, 0.5, 0.5)
        assert r.returncode == 1
        assert "magic" in r.stderr

    def test_tensor_size_overflow_rejected(self, minireader, tmp_path):
        # 61 dims of n=2: the element count is 2^61, so count*8 wraps
        # size_t to 0 — a crafted file must be rejected as a format
        # error, never under-allocated (ASan-confirmed overflow before
        # the guard existed).
        import struct

        d = 61
        body = struct.pack("<I", d)
        body += struct.pack(f"<{d}d", *([-1.0] * d))
        body += struct.pack(f"<{d}d", *([1.0] * d))
        body += struct.pack(f"<{d}I", *([2] * d))
        body += b"\x00" * 64  # a few fake tensor bytes
        bad = tmp_path / "overflow.pcb"
        bad.write_bytes(b"PCB\x00\x01\x00\x01\x00\x00\x00\x00\x00" + body)
        r = _run(minireader, bad, *([0.0] * d))
        assert r.returncode == 1
        assert "invalid field" in r.stderr or "field" in r.stderr

    def test_usage_without_args(self, minireader):
        r = subprocess.run([str(minireader)], capture_output=True, text=True)
        assert r.returncode == 2
        assert "usage" in r.stderr


class TestIncompleteStdinPoint:
    def test_partial_point_reports_error(self, minireader):
        r = _run(minireader, FIXTURES / "approx_5d_bs.pcb", "-",
                 stdin="100 100 1\n")
        assert r.returncode == 1
        assert "incomplete point" in r.stderr
