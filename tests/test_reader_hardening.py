"""Adversarial .pcb inputs every consumer must reject with typed errors.

Regression pins for the native-reader review findings: wrapped piece
products, trailing garbage, out-of-domain knots, and degenerate
domains must all fail loudly (typed error / nonzero-but-clean CLI
exit) in the canonical library, the C++ CLI, the stdlib-Python reader,
and the Perl reader — never crash, never silently evaluate.
"""

import importlib.util
import io
import os
import shutil
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPP_EVAL = os.path.join(REPO, "cpp", "pcb_eval")
PERL_READER = os.path.join(REPO, "readers", "perl", "pcbreader.pl")


def _pystdlib():
    spec = importlib.util.spec_from_file_location(
        "pcbreader_hard", os.path.join(REPO, "readers", "pystdlib",
                                       "pcbreader.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _header(tag):
    return b"PCB\x00" + bytes([1, 0]) + struct.pack("<H", tag) + b"\x00" * 4


def _spline_bytes(d, lo, hi, n, knots, num_pieces, piece_blob=b""):
    out = [_header(2), struct.pack("<I", d)]
    out.append(struct.pack(f"<{d}d", *lo))
    out.append(struct.pack(f"<{d}d", *hi))
    out.append(struct.pack(f"<{d}I", *n))
    out.append(struct.pack(f"<{d}I", *[len(k) for k in knots]))
    flat = [x for k in knots for x in k]
    if flat:
        out.append(struct.pack(f"<{len(flat)}d", *flat))
    out.append(struct.pack("<I", num_pieces))
    out.append(piece_blob)
    return b"".join(out)


def _approx_bytes(d, lo, hi, n, values):
    out = [_header(1), struct.pack("<I", d)]
    out.append(struct.pack(f"<{d}d", *lo))
    out.append(struct.pack(f"<{d}d", *hi))
    out.append(struct.pack(f"<{d}I", *n))
    out.append(struct.pack(f"<{len(values)}d", *values))
    return b"".join(out)


WRAPPED_PIECES = _spline_bytes(
    4, [0.0] * 4, [1.0] * 4, [2] * 4,
    [list(np.linspace(0.001, 0.999, 65535))] * 4,
    num_pieces=0)  # 65536^4 wraps size_t to 0

TRAILING = _approx_bytes(1, [0.0], [1.0], [3],
                         [0.0, 0.5, 1.0]) + b"GARBAGE!"

KNOT_OUTSIDE = _spline_bytes(
    1, [0.0], [1.0], [3], [[-5.0]], num_pieces=2,
    piece_blob=struct.pack("<6d", *([1.0] * 6)))

DEGENERATE = _approx_bytes(
    1, [1.0], [1.0 + 2e-16], [64], [0.0] * 64)

CASES = {
    "wrapped-pieces": WRAPPED_PIECES,
    "trailing-bytes": TRAILING,
    "knot-outside-domain": KNOT_OUTSIDE,
    "degenerate-domain": DEGENERATE,
}


@pytest.fixture(params=sorted(CASES))
def crafted(request, tmp_path):
    path = tmp_path / f"{request.param}.pcb"
    path.write_bytes(CASES[request.param])
    return request.param, path


class TestEveryConsumerRejects:
    def test_canonical_library(self, crafted):
        name, path = crafted
        from pychebyshev_tpu.utils import binary
        tag = CASES[name][6]  # class_tag low byte
        reader = binary.read_spline if tag == 2 else binary.read_approx
        if name == "trailing-bytes":
            # Reference parity: the canonical reader stops at the end
            # of the payload and tolerates appended bytes (the
            # upstream reader does the same); the independent readers
            # are deliberately stricter.
            with open(path, "rb") as fh:
                obj = reader(fh)
            assert obj is not None
            return
        with pytest.raises(ValueError):
            with open(path, "rb") as fh:
                reader(fh)

    def test_cpp_cli(self, crafted):
        if not os.path.exists(CPP_EVAL):
            pytest.skip("cpp binary not built")
        name, path = crafted
        coords = ["0.5"] * (4 if name == "wrapped-pieces" else 1)
        out = subprocess.run([CPP_EVAL, str(path), *coords],
                             capture_output=True, text=True, timeout=60)
        assert out.returncode != 0, (name, out.stdout)
        assert "error" in out.stderr.lower()

    def test_pystdlib(self, crafted):
        name, path = crafted
        mod = _pystdlib()
        with pytest.raises(mod.PcbError):
            mod.read_pcb(str(path))

    def test_perl(self, crafted):
        if shutil.which("perl") is None:
            pytest.skip("perl not available")
        name, path = crafted
        coords = ["0.5"] * (4 if name == "wrapped-pieces" else 1)
        out = subprocess.run(["perl", PERL_READER, str(path), *coords],
                             capture_output=True, text=True, timeout=60)
        assert out.returncode != 0, (name, out.stdout)


def test_capi_rejects_negative_dimensionality(tmp_path):
    import ctypes
    lib_path = os.path.join(REPO, "cpp", "libpcb.so")
    if not os.path.exists(lib_path):
        pytest.skip("libpcb.so not built")
    fixture = os.path.join(REPO, "tests", "fixtures",
                           "approx_2d_simple.pcb")
    lib = ctypes.CDLL(lib_path)
    lib.pcb_load.restype = ctypes.c_void_p
    lib.pcb_load.argtypes = [ctypes.c_char_p]
    handle = lib.pcb_load(fixture.encode())
    assert handle
    out = ctypes.c_double()
    pt = (ctypes.c_double * 2)(0.5, 0.5)
    lib.pcb_eval.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_double),
                             ctypes.c_int,
                             ctypes.POINTER(ctypes.c_double)]
    handle = ctypes.c_void_p(handle)
    assert lib.pcb_eval(handle, pt, -1, ctypes.byref(out)) == -1
    assert lib.pcb_eval(handle, pt, 2, ctypes.byref(out)) == 0
    lib.pcb_free.argtypes = [ctypes.c_void_p]
    lib.pcb_free(handle)
