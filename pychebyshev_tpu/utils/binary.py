"""Portable ``.pcb`` binary serialization, byte-compatible with the
reference format v1.0 (reference ``_binary.py``; spec:
``docs/user-guide/binary-format.md`` in the reference repo).

Layout: 12-byte header (magic ``PCB\\x00``, major u8, minor u8,
class_tag u16 LE, 4 reserved zero bytes), then little-endian f64 floats
and u32 integers, C-order tensors, no padding.  Files written here are
readable by the reference library, its native readers, and the C++
reader shipped in ``cpp/`` — and vice versa.

This is deliberately host-side NumPy: serialization is an I/O boundary,
not a compute path.
"""

from __future__ import annotations

import os
import struct
from typing import BinaryIO

import numpy as np

MAGIC = b"PCB\x00"
MAJOR = 1
MINOR = 0
CLASS_TAG_APPROX = 1
CLASS_TAG_SPLINE = 2

_HEADER_SIZE = 12


def peek_format_version(filename: str) -> int:
    """Return the major format version from a .pcb header (no body read)."""
    with open(filename, "rb") as f:
        header = f.read(_HEADER_SIZE)
    if len(header) < _HEADER_SIZE:
        raise ValueError(
            f"file {filename!r} is shorter than the {_HEADER_SIZE}-byte "
            f".pcb header"
        )
    if header[:4] != MAGIC:
        raise ValueError(
            f"file {filename!r} is not a .pcb file (magic mismatch: "
            f"got {header[:4]!r}, expected {MAGIC!r})"
        )
    return int(header[4])


# --- low-level strict-dtype array I/O ------------------------------------


def _write_u32(f: BinaryIO, n: int) -> None:
    f.write(struct.pack("<I", n))


def _read_u32(f: BinaryIO) -> int:
    raw = f.read(4)
    if len(raw) != 4:
        raise ValueError("unexpected EOF reading uint32")
    return struct.unpack("<I", raw)[0]


def _write_u32_array(f: BinaryIO, arr) -> None:
    a = np.asarray(arr)
    if a.dtype != np.uint32:
        raise TypeError(
            f"binary format requires uint32 arrays, got dtype={a.dtype}"
        )
    f.write(np.ascontiguousarray(a, dtype="<u4").tobytes())


def _read_u32_array(f: BinaryIO, count: int) -> np.ndarray:
    nbytes = count * 4
    raw = f.read(nbytes)
    if len(raw) != nbytes:
        raise ValueError(
            f"unexpected EOF reading uint32 array (wanted {nbytes} bytes, "
            f"got {len(raw)})"
        )
    return np.frombuffer(raw, dtype="<u4").astype(np.uint32, copy=True)


def _write_f64_array(f: BinaryIO, arr) -> None:
    a = np.asarray(arr)
    if a.dtype != np.float64:
        raise TypeError(
            f"binary format requires float64 arrays, got dtype={a.dtype}"
        )
    f.write(np.ascontiguousarray(a, dtype="<f8").tobytes())


def _read_f64_array(f: BinaryIO, count: int) -> np.ndarray:
    nbytes = count * 8
    raw = f.read(nbytes)
    if len(raw) != nbytes:
        raise ValueError(
            f"unexpected EOF reading f64 array (wanted {nbytes} bytes, "
            f"got {len(raw)})"
        )
    return np.frombuffer(raw, dtype="<f8").astype(np.float64, copy=True)


# --- header --------------------------------------------------------------


def _write_header(f: BinaryIO, class_tag: int) -> None:
    f.write(MAGIC)
    f.write(struct.pack("<BB", MAJOR, MINOR))
    f.write(struct.pack("<H", class_tag))
    f.write(b"\x00\x00\x00\x00")


def _read_header(f: BinaryIO) -> int:
    raw = f.read(_HEADER_SIZE)
    if len(raw) != _HEADER_SIZE:
        raise ValueError(
            f"unexpected EOF reading header (wanted {_HEADER_SIZE} bytes, "
            f"got {len(raw)})"
        )
    if raw[:4] != MAGIC:
        raise ValueError("not a PyChebyshev binary file (bad magic)")
    major, _minor = struct.unpack("<BB", raw[4:6])
    if major != MAJOR:
        raise ValueError(
            f"unsupported .pcb major version {major} "
            f"(this build reads major {MAJOR})"
        )
    class_tag = struct.unpack("<H", raw[6:8])[0]
    if raw[8:12] != b"\x00\x00\x00\x00":
        raise ValueError("reserved header bytes nonzero — file may be corrupt")
    return class_tag


def detect_format(path) -> str:
    """'binary' if the file starts with the .pcb magic, else 'pickle'."""
    with open(os.fspath(path), "rb") as f:
        head = f.read(4)
    return "binary" if head == MAGIC else "pickle"


# --- ChebyshevApproximation ----------------------------------------------


def write_approx(f: BinaryIO, cheb) -> None:
    """Write a built approximation: header, u32 d, f64 lo[d], f64 hi[d],
    u32 n_nodes[d], f64 tensor (C-order)."""
    if getattr(cheb, "additional_data", None) is not None:
        raise NotImplementedError(
            "binary format cannot store additional_data; "
            "pass format='pickle' or set additional_data=None before saving"
        )
    if cheb.tensor_values is None:
        raise RuntimeError("Cannot save an unbuilt ChebyshevApproximation")

    _write_header(f, CLASS_TAG_APPROX)
    d = int(cheb.num_dimensions)
    _write_u32(f, d)
    _write_f64_array(
        f, np.array([cheb.domain[i][0] for i in range(d)], dtype=np.float64))
    _write_f64_array(
        f, np.array([cheb.domain[i][1] for i in range(d)], dtype=np.float64))
    _write_u32_array(f, np.array(cheb.n_nodes, dtype=np.uint32))
    tensor = np.ascontiguousarray(
        np.asarray(cheb.tensor_values), dtype=np.float64)
    _write_f64_array(f, tensor.ravel(order="C"))


def read_approx(f: BinaryIO):
    """Read an approximation; reconstructs via ``from_values`` so grid
    metadata is recomputed consistently."""
    from pychebyshev_tpu.models.approximation import ChebyshevApproximation

    tag = _read_header(f)
    if tag != CLASS_TAG_APPROX:
        raise ValueError(
            f"file contains class_tag {tag}, expected "
            f"{CLASS_TAG_APPROX} (ChebyshevApproximation)"
        )

    d = _read_u32(f)
    if d < 1:
        raise ValueError(f"num_dimensions must be >= 1, got {d}")

    domain_lo = _read_f64_array(f, count=d)
    domain_hi = _read_f64_array(f, count=d)
    domain = [[float(domain_lo[i]), float(domain_hi[i])] for i in range(d)]
    for i, (lo, hi) in enumerate(domain):
        if lo >= hi:
            raise ValueError(f"domain[{i}]: lo ({lo}) must be < hi ({hi})")

    n_nodes = [int(n) for n in _read_u32_array(f, count=d)]
    for i, n in enumerate(n_nodes):
        if n < 1:
            raise ValueError(f"n_nodes[{i}] must be >= 1, got {n}")

    total = int(np.prod(n_nodes))
    tensor = _read_f64_array(f, count=total).reshape(tuple(n_nodes), order="C")

    return ChebyshevApproximation.from_values(
        tensor_values=tensor, num_dimensions=d, domain=domain,
        n_nodes=n_nodes,
    )


# --- ChebyshevSpline -----------------------------------------------------


def write_spline(f: BinaryIO, spline) -> None:
    """Write a built spline: header, u32 d, domain, flat n_nodes,
    u32 num_knots[d], concatenated f64 knots, u32 num_pieces,
    per-piece C-order tensors."""
    if any(p is None for p in spline._pieces):
        raise RuntimeError("Cannot save an unbuilt ChebyshevSpline")
    if getattr(spline, "additional_data", None) is not None:
        raise NotImplementedError(
            "binary format cannot store additional_data; "
            "pass format='pickle' or set additional_data=None before saving"
        )
    from pychebyshev_tpu.models.spline import is_nested_n_nodes
    if is_nested_n_nodes(spline.n_nodes):
        raise NotImplementedError(
            "binary format requires flat n_nodes (shared across pieces); "
            "use format='pickle' for nested-n_nodes splines"
        )

    _write_header(f, CLASS_TAG_SPLINE)
    d = int(spline.num_dimensions)
    _write_u32(f, d)
    _write_f64_array(
        f, np.array([spline.domain[i][0] for i in range(d)], dtype=np.float64))
    _write_f64_array(
        f, np.array([spline.domain[i][1] for i in range(d)], dtype=np.float64))
    _write_u32_array(f, np.array(spline.n_nodes, dtype=np.uint32))
    _write_u32_array(
        f, np.array([len(spline.knots[i]) for i in range(d)], dtype=np.uint32))

    parts = [np.asarray(spline.knots[i], dtype=np.float64)
             for i in range(d) if len(spline.knots[i]) > 0]
    if parts:
        _write_f64_array(f, np.concatenate(parts))

    _write_u32(f, len(spline._pieces))
    for piece in spline._pieces:
        flat = np.ascontiguousarray(
            np.asarray(piece.tensor_values), dtype=np.float64).ravel(order="C")
        _write_f64_array(f, flat)


def read_spline(f: BinaryIO):
    """Read a spline; reconstructs via ``ChebyshevSpline.from_values``."""
    from pychebyshev_tpu.models.spline import ChebyshevSpline

    tag = _read_header(f)
    if tag != CLASS_TAG_SPLINE:
        raise ValueError(
            f"file contains class_tag {tag}, expected "
            f"{CLASS_TAG_SPLINE} (ChebyshevSpline)"
        )

    d = _read_u32(f)
    if d < 1:
        raise ValueError(f"num_dimensions must be >= 1, got {d}")

    domain_lo = _read_f64_array(f, count=d)
    domain_hi = _read_f64_array(f, count=d)
    domain = [[float(domain_lo[i]), float(domain_hi[i])] for i in range(d)]
    for i, (lo, hi) in enumerate(domain):
        if lo >= hi:
            raise ValueError(f"domain[{i}]: lo ({lo}) must be < hi ({hi})")

    n_nodes = [int(n) for n in _read_u32_array(f, count=d)]
    for i, n in enumerate(n_nodes):
        if n < 1:
            raise ValueError(f"n_nodes[{i}] must be >= 1, got {n}")

    num_knots = [int(k) for k in _read_u32_array(f, count=d)]
    total_knots = sum(num_knots)
    flat_knots = (_read_f64_array(f, count=total_knots)
                  if total_knots > 0 else np.array([], dtype=np.float64))

    knots = []
    offset = 0
    for i in range(d):
        k = num_knots[i]
        knots_i = [float(x) for x in flat_knots[offset:offset + k]]
        offset += k
        if k > 1 and any(knots_i[j] >= knots_i[j + 1] for j in range(k - 1)):
            raise ValueError(f"knots in dim {i} not strictly ascending")
        knots.append(knots_i)

    num_pieces = _read_u32(f)
    expected = 1
    for k in num_knots:
        expected *= k + 1
    if num_pieces != expected:
        raise ValueError(
            f"num_pieces={num_pieces} does not match prod(num_knots+1)"
            f"={expected}"
        )

    per_piece = int(np.prod(n_nodes))
    piece_values = [
        _read_f64_array(f, count=per_piece).reshape(tuple(n_nodes), order="C")
        for _ in range(num_pieces)
    ]

    return ChebyshevSpline.from_values(
        piece_values=piece_values, num_dimensions=d, domain=domain,
        n_nodes=n_nodes, knots=knots,
    )
