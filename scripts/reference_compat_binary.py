"""Reference-era ``pychebyshev._binary`` surface for the shim suite.

The upstream test corpus (run by ``run_reference_suite.py``) pins the
reference's exact error-message wording and imports its private helper
names (``_write_u32``, ``_read_header``, ...).  This library words its
own errors its own way (``pychebyshev_tpu/utils/binary.py``), so the
shim installs this adapter as ``pychebyshev._binary``: it re-exposes the
old helper names on top of the new cursor API and rewrites raised
messages into the phrasing the upstream tests expect.

Test scaffolding only — nothing in the library imports this.
"""

from __future__ import annotations

import functools
import re
import struct
import types

import numpy as np

import pychebyshev_tpu.utils.binary as B

# ours -> upstream-test-compatible phrasing (applied first match wins)
_REWRITES = [
    (r"truncated \.pcb stream: EOF inside (.+?) \(\d+/\d+ bytes present\)",
     lambda m: f"unexpected EOF reading {m.group(1)}"),
    (r"magic bytes .* are not the \.pcb signature.*",
     lambda m: "not a PyChebyshev binary file (magic mismatch)"),
    (r"\.pcb major version (\d+) is newer than this build understands.*",
     lambda m: f"unsupported .pcb major version {m.group(1)}"),
    (r"reserved header bytes must be zero.*",
     lambda m: "reserved header bytes nonzero (possibly corrupt file)"),
    (r"class_tag (\d+) in file, but this loader handles class_tag "
     r"(\d+) \((\w+)\)",
     lambda m: (f"file contains class_tag {m.group(1)}, expected "
                f"{m.group(2)} ({m.group(3)})")),
    (r"num_dimensions field is (-?\d+); must be >= 1",
     lambda m: f"num_dimensions must be >= 1, got {m.group(1)}"),
    (r"domain\[(\d+)\] is empty or inverted: lo=(\S+) not below hi=(\S+)",
     lambda m: (f"domain[{m.group(1)}]: lo ({m.group(2)}) must be < hi "
                f"({m.group(3)})")),
    (r"n_nodes\[(\d+)\] is (\d+); must be >= 1",
     lambda m: f"n_nodes[{m.group(1)}] must be >= 1, got {m.group(2)}"),
    (r"num_pieces=(\d+) inconsistent with knot counts: "
     r"prod\(num_knots\+1\)=(\d+)",
     lambda m: (f"num_pieces={m.group(1)}, expected prod(num_knots+1)"
                f"={m.group(2)}")),
    (r"the \.pcb format has no additional_data field.*",
     lambda m: ("binary format cannot store additional_data; use "
                "format='pickle'")),
    (r"the \.pcb spline record stores one shared n_nodes vector.*",
     lambda m: ("binary format requires flat n_nodes; use "
                "format='pickle' for nested-n_nodes splines")),
]


def _rewrite(msg: str) -> str:
    for pattern, repl in _REWRITES:
        m = re.search(pattern, msg, flags=re.DOTALL)
        if m:
            return repl(m)
    return msg


def _ref_worded(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (ValueError, NotImplementedError) as e:
            raise type(e)(_rewrite(str(e))) from None
    return wrapper


# --- reference-era low-level helpers --------------------------------------


def _write_u32(f, n):
    f.write(struct.pack("<I", int(n)))


def _read_u32(f):
    raw = f.read(4)
    if len(raw) != 4:
        raise ValueError("unexpected EOF reading uint32")
    return struct.unpack("<I", raw)[0]


def _write_u32_array(f, arr):
    B._emit_array(f, arr, np.uint32)


def _read_u32_array(f, count):
    raw = f.read(4 * count)
    if len(raw) != 4 * count:
        raise ValueError("unexpected EOF reading uint32 array")
    return np.frombuffer(raw, dtype="<u4").astype(np.uint32, copy=True)


def _write_f64_array(f, arr):
    B._emit_array(f, arr, np.float64)


def _read_f64_array(f, count):
    raw = f.read(8 * count)
    if len(raw) != 8 * count:
        raise ValueError("unexpected EOF reading f64 array")
    return np.frombuffer(raw, dtype="<f8").astype(np.float64, copy=True)


def _write_header(f, class_tag):
    B._emit_header(f, class_tag)


def _read_header(f):
    raw = f.read(B._HEADER_SIZE)
    if len(raw) != B._HEADER_SIZE:
        raise ValueError("unexpected EOF reading header")
    if raw[:4] != B.MAGIC:
        raise ValueError("not a PyChebyshev binary file (magic mismatch)")
    major, _minor, class_tag = struct.unpack("<BBH", raw[4:8])
    if major != B.MAJOR:
        raise ValueError(f"unsupported .pcb major version {major}")
    if raw[8:12] != bytes(4):
        raise ValueError("reserved header bytes nonzero (possibly "
                         "corrupt file)")
    return class_tag


def install():
    """Build the ``pychebyshev._binary`` module object and patch the
    library's binary entry points with message-rewriting wrappers (so
    class-level ``save``/``load`` also surface upstream wording)."""
    for name in ("write_approx", "read_approx", "write_spline",
                 "read_spline", "peek_format_version"):
        fn = getattr(B, name)
        if not getattr(fn, "_ref_worded", False):
            wrapped = _ref_worded(fn)
            wrapped._ref_worded = True
            setattr(B, name, wrapped)

    mod = types.ModuleType("pychebyshev._binary")
    for name in ("MAGIC", "MAJOR", "MINOR", "CLASS_TAG_APPROX",
                 "CLASS_TAG_SPLINE", "detect_format", "write_approx",
                 "read_approx", "write_spline", "read_spline",
                 "peek_format_version"):
        setattr(mod, name, getattr(B, name))
    for helper in (_write_u32, _read_u32, _write_u32_array,
                   _read_u32_array, _write_f64_array, _read_f64_array,
                   _write_header, _read_header):
        setattr(mod, helper.__name__, helper)
    return mod
