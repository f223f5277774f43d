"""Mutation fuzz across every .pcb consumer.

Random single/multi-byte corruptions, truncations, and extensions of a
valid file must produce a clean typed error or a successful parse in
every reader — never a crash, hang, or huge allocation.  Deterministic
seed so CI failures reproduce.
"""

import importlib.util
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")

spec = importlib.util.spec_from_file_location(
    "pcbreader_fuzz", os.path.join(REPO, "readers", "pystdlib",
                                   "pcbreader.py"))
pystdlib = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pystdlib)


def mutations(base: bytes, rng, count):
    """Yield deterministic corrupted variants of ``base``."""
    n = len(base)
    for _ in range(count):
        kind = rng.integers(0, 4)
        raw = bytearray(base)
        if kind == 0:        # flip one byte
            raw[rng.integers(0, n)] ^= int(rng.integers(1, 256))
        elif kind == 1:      # stomp a random 4-byte window
            i = int(rng.integers(0, max(1, n - 4)))
            raw[i:i + 4] = rng.integers(0, 256, 4, dtype=np.uint8) \
                .tobytes()
        elif kind == 2:      # truncate
            raw = raw[:int(rng.integers(0, n))]
        else:                # append garbage
            raw += rng.integers(0, 256, int(rng.integers(1, 16)),
                                dtype=np.uint8).tobytes()
        yield bytes(raw)


def all_fixture_bytes():
    out = []
    for name in ("approx_2d_simple.pcb", "spline_1d_kink.pcb"):
        with open(os.path.join(FIXTURES, name), "rb") as f:
            out.append(f.read())
    return out


@pytest.mark.filterwarnings("error::RuntimeWarning")
class TestPythonReadersFuzz:
    def test_stdlib_reader_never_crashes(self):
        rng = np.random.default_rng(1234)
        for base in all_fixture_bytes():
            for raw in mutations(base, rng, 150):
                try:
                    obj = pystdlib.read_pcb_from_bytes(raw)
                    assert obj.num_dimensions >= 1
                except pystdlib.PcbError:
                    pass           # typed rejection is the contract

    def test_library_reader_never_crashes(self):
        import io
        from pychebyshev_tpu.utils import binary
        rng = np.random.default_rng(99)
        for base in all_fixture_bytes():
            for raw in mutations(base, rng, 60):
                buf = io.BytesIO(raw)
                try:
                    tag = raw[6] if len(raw) > 6 else 1
                    if tag == binary.CLASS_TAG_SPLINE:
                        binary.read_spline(buf)
                    else:
                        binary.read_approx(buf)
                except (ValueError, NotImplementedError):
                    pass


@pytest.mark.skipif(not os.path.exists(os.path.join(REPO, "cpp",
                                                    "pcb_eval")),
                    reason="cpp/pcb_eval not built")
class TestCppCliFuzz:
    def test_cli_exits_cleanly(self, tmp_path):
        rng = np.random.default_rng(7)
        exe = os.path.join(REPO, "cpp", "pcb_eval")
        for base in all_fixture_bytes():
            for i, raw in enumerate(mutations(base, rng, 40)):
                p = tmp_path / f"m{i}.pcb"
                p.write_bytes(raw)
                out = subprocess.run([exe, str(p), "0.1", "0.1"],
                                     capture_output=True, timeout=20)
                # clean exit codes only; negative = killed by signal
                assert out.returncode in (0, 1, 2), (
                    f"reader crashed (rc={out.returncode}) on mutation "
                    f"{i}")


@pytest.mark.skipif(shutil.which("perl") is None,
                    reason="perl not available")
class TestPerlFuzz:
    def test_perl_exits_cleanly(self, tmp_path):
        rng = np.random.default_rng(21)
        reader = os.path.join(REPO, "readers", "perl", "pcbreader.pl")
        for base in all_fixture_bytes():
            for i, raw in enumerate(mutations(base, rng, 25)):
                p = tmp_path / f"m{i}.pcb"
                p.write_bytes(raw)
                out = subprocess.run(["perl", reader, str(p), "0.1"],
                                     capture_output=True, timeout=20)
                assert out.returncode in (0, 1, 2)
