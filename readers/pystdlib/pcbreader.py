"""Dependency-free ``.pcb`` reader + evaluator (Python stdlib only).

A second, independent consumer of the portable binary format, written
against ``docs/user-guide/binary-format.md`` alone — no numpy, no
import of ``pychebyshev_tpu``.  It fills the role the reference repo's
Julia reader plays there: proving the byte contract with a parser whose
only shared artifact with the main implementation is the spec.

Surface (mirrors the reference reader crates):

- ``read_pcb(path)`` / ``read_pcb_from_bytes(data)`` ->
  :class:`Approximation` or :class:`Spline`
- both types implement ``evaluate(point)`` via the normalized
  barycentric collapse, so the module doubles as a standalone
  evaluator (like the reference's C ``reader.c``)
- :class:`PcbError` with a ``kind`` from :data:`ERROR_KINDS`

CLI:  python pcbreader.py model.pcb x1 x2 ... xd
"""

from __future__ import annotations

import bisect
import math
import struct
import sys

ERROR_KINDS = (
    "InvalidMagic",
    "UnsupportedVersion",
    "NonzeroReserved",
    "UnknownClassTag",
    "Truncated",
    "InvalidField",
)

_MAGIC = b"PCB\x00"
_SUPPORTED_MAJOR = 1
_TAG_APPROX = 1
_TAG_SPLINE = 2
_NODE_TOL = 1e-14
_MAX_TOTAL = 1 << 27  # element cap; shared by every .pcb consumer


class PcbError(Exception):
    """Typed parse failure; ``kind`` is one of ERROR_KINDS."""

    def __init__(self, kind: str, detail: str):
        assert kind in ERROR_KINDS
        self.kind = kind
        super().__init__(f"{kind}: {detail}")


class _Scanner:
    """Offset-tracking view over the raw bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def pull(self, n: int, what: str) -> bytes:
        end = self.pos + n
        if end > len(self.data):
            raise PcbError(
                "Truncated",
                f"{what}: need {n} bytes at offset {self.pos}, file has "
                f"{len(self.data) - self.pos} left")
        chunk = self.data[self.pos:end]
        self.pos = end
        return chunk

    def u32(self, what: str) -> int:
        return struct.unpack("<I", self.pull(4, what))[0]

    def u32_list(self, count: int, what: str) -> list:
        raw = self.pull(4 * count, what)
        return list(struct.unpack(f"<{count}I", raw))

    def f64_list(self, count: int, what: str) -> list:
        raw = self.pull(8 * count, what)
        return list(struct.unpack(f"<{count}d", raw))


# --- grid reconstruction (spec "Reconstruction contract") -----------------


def chebyshev_nodes(lo: float, hi: float, n: int) -> list:
    """Type-I Chebyshev points scaled to [lo, hi], ascending."""
    mid, half = 0.5 * (lo + hi), 0.5 * (hi - lo)
    pts = [mid + half * (-math.cos((2 * k + 1) * math.pi / (2 * n)))
           for k in range(n)]
    return sorted(pts)


def barycentric_weights(nodes: list) -> list:
    out = []
    for i, xi in enumerate(nodes):
        prod = 1.0
        for j, xj in enumerate(nodes):
            if j != i:
                prod *= xi - xj
        if prod == 0.0 or prod != prod or prod in (float("inf"),
                                                   float("-inf")):
            # Coincident nodes (a degenerate domain narrower than f64
            # resolution at this node count) or over/underflow: a typed
            # error, never a raw ZeroDivisionError.
            raise PcbError("InvalidField",
                           "degenerate grid: barycentric weights are "
                           "not finite")
        out.append(1.0 / prod)
    return out


def _collapse(values: list, shape: list, nodes_per_dim: list,
              weights_per_dim: list, point: list) -> float:
    """Barycentric dimensional collapse, highest dim first.

    ``values`` is the flat C-order tensor; after collapsing dim d the
    list shrinks by a factor of shape[d].
    """
    vals = values
    for d in range(len(shape) - 1, -1, -1):
        n = shape[d]
        nodes = nodes_per_dim[d]
        x = point[d]
        # exact-node hit takes the nodal slice directly
        hit = next((i for i, nd in enumerate(nodes)
                    if abs(x - nd) < _NODE_TOL), None)
        if hit is not None:
            vals = [vals[base + hit] for base in range(0, len(vals), n)]
            continue
        terms = [w / (x - nd)
                 for w, nd in zip(weights_per_dim[d], nodes)]
        denom = sum(terms)
        vals = [sum(vals[base + i] * t for i, t in enumerate(terms))
                / denom
                for base in range(0, len(vals), n)]
    return vals[0]


# --- parsed objects --------------------------------------------------------


class Approximation:
    """Parsed class_tag-1 record (dense value tensor + grid metadata)."""

    def __init__(self, num_dimensions, domain_lo, domain_hi, n_nodes,
                 tensor_values):
        self.num_dimensions = num_dimensions
        self.domain_lo = domain_lo
        self.domain_hi = domain_hi
        self.n_nodes = n_nodes
        self.tensor_values = tensor_values  # flat, C-order
        self._nodes = [chebyshev_nodes(lo, hi, n) for lo, hi, n
                       in zip(domain_lo, domain_hi, n_nodes)]
        self._weights = [barycentric_weights(nd) for nd in self._nodes]

    def evaluate(self, point: list) -> float:
        if len(point) != self.num_dimensions:
            raise ValueError(
                f"point has {len(point)} coords, file is "
                f"{self.num_dimensions}-D")
        return _collapse(self.tensor_values, self.n_nodes, self._nodes,
                         self._weights, [float(x) for x in point])


class Spline:
    """Parsed class_tag-2 record: knots + one Approximation per piece.

    Piece tensors are interpolants on their own sub-intervals: per dim,
    the knots split ``[lo, hi]`` into ``num_knots + 1`` cells, and piece
    ``(i_0, ..., i_{d-1})`` (C-order flattened) lives on the Cartesian
    product of cells ``i_k``.
    """

    def __init__(self, num_dimensions, domain_lo, domain_hi, n_nodes,
                 knots, piece_tensors):
        self.num_dimensions = num_dimensions
        self.domain_lo = domain_lo
        self.domain_hi = domain_hi
        self.n_nodes = n_nodes
        self.knots = knots
        bounds = [[lo] + list(k) + [hi] for lo, hi, k
                  in zip(domain_lo, domain_hi, knots)]
        shape = [len(k) + 1 for k in knots]
        self.pieces = []
        for flat, tensor in enumerate(piece_tensors):
            cell, rem = [], flat
            for s in reversed(shape):
                cell.append(rem % s)
                rem //= s
            cell.reverse()
            self.pieces.append(Approximation(
                num_dimensions,
                [bounds[d][cell[d]] for d in range(num_dimensions)],
                [bounds[d][cell[d] + 1] for d in range(num_dimensions)],
                n_nodes, tensor))

    def _piece_index(self, point: list) -> int:
        flat = 0
        for d in range(self.num_dimensions):
            k = self.knots[d]
            idx = bisect.bisect_right(k, point[d])
            idx = min(idx, len(k))  # clamp
            flat = flat * (len(k) + 1) + idx
        return flat

    def evaluate(self, point: list) -> float:
        if len(point) != self.num_dimensions:
            raise ValueError(
                f"point has {len(point)} coords, file is "
                f"{self.num_dimensions}-D")
        point = [float(x) for x in point]
        return self.pieces[self._piece_index(point)].evaluate(point)


# --- parsing ----------------------------------------------------------------


def _parse_header(sc: _Scanner) -> int:
    magic = sc.pull(4, "header magic")
    if magic != _MAGIC:
        raise PcbError("InvalidMagic",
                       f"got {magic!r}, want {_MAGIC!r}")
    major = sc.pull(1, "major version")[0]
    sc.pull(1, "minor version")
    if major != _SUPPORTED_MAJOR:
        raise PcbError("UnsupportedVersion",
                       f"major {major}, this reader knows "
                       f"{_SUPPORTED_MAJOR}")
    tag = struct.unpack("<H", sc.pull(2, "class tag"))[0]
    reserved = sc.pull(4, "reserved bytes")
    if reserved != b"\x00\x00\x00\x00":
        raise PcbError("NonzeroReserved", f"reserved = {reserved!r}")
    return tag


def _parse_grid(sc: _Scanner):
    d = sc.u32("num_dimensions")
    if d < 1:
        raise PcbError("InvalidField", f"num_dimensions = {d}")
    lo = sc.f64_list(d, "domain_lo")
    hi = sc.f64_list(d, "domain_hi")
    for i in range(d):
        if not lo[i] < hi[i]:
            raise PcbError("InvalidField",
                           f"domain[{i}] = [{lo[i]}, {hi[i]}]")
    n_nodes = sc.u32_list(d, "n_nodes")
    total = 1
    for i, n in enumerate(n_nodes):
        if n < 1:
            raise PcbError("InvalidField", f"n_nodes[{i}] = {n}")
        total *= n
        if total > _MAX_TOTAL:
            raise PcbError("InvalidField",
                           f"tensor would exceed {_MAX_TOTAL} elements")
    return d, lo, hi, n_nodes, total


def _parse_approx(sc: _Scanner) -> Approximation:
    d, lo, hi, n_nodes, total = _parse_grid(sc)
    tensor = sc.f64_list(total, "tensor_values")
    if sc.pos != len(sc.data):
        raise PcbError("InvalidField",
                       f"{len(sc.data) - sc.pos} trailing bytes after "
                       f"tensor")
    return Approximation(d, lo, hi, n_nodes, tensor)


def _parse_spline(sc: _Scanner) -> Spline:
    d, lo, hi, n_nodes, per_piece = _parse_grid(sc)
    num_knots = sc.u32_list(d, "num_knots")
    knots = []
    for i, k in enumerate(num_knots):
        ki = sc.f64_list(k, f"knots dim {i}")
        if any(ki[j] >= ki[j + 1] for j in range(len(ki) - 1)):
            raise PcbError("InvalidField",
                           f"knots dim {i} not strictly ascending")
        if any(not (lo[i] < kn < hi[i]) for kn in ki):
            raise PcbError("InvalidField",
                           f"knots dim {i} not strictly inside domain")
        knots.append(ki)
    num_pieces = sc.u32("num_pieces")
    expect = 1
    for k in num_knots:
        expect *= k + 1
    if num_pieces != expect:
        raise PcbError("InvalidField",
                       f"num_pieces = {num_pieces}, knots imply {expect}")
    if num_pieces * per_piece > _MAX_TOTAL:
        raise PcbError("InvalidField", "pieces exceed element cap")
    tensors = [sc.f64_list(per_piece, f"piece {p}")
               for p in range(num_pieces)]
    if sc.pos != len(sc.data):
        raise PcbError("InvalidField",
                       f"{len(sc.data) - sc.pos} trailing bytes after "
                       f"pieces")
    return Spline(d, lo, hi, n_nodes, knots, tensors)


def read_pcb_from_bytes(data: bytes):
    """Parse a .pcb byte string -> Approximation | Spline."""
    sc = _Scanner(bytes(data))
    tag = _parse_header(sc)
    if tag == _TAG_APPROX:
        return _parse_approx(sc)
    if tag == _TAG_SPLINE:
        return _parse_spline(sc)
    raise PcbError("UnknownClassTag", f"class_tag = {tag}")


def read_pcb(path: str):
    """Parse a .pcb file -> Approximation | Spline."""
    with open(path, "rb") as f:
        return read_pcb_from_bytes(f.read())


def main(argv) -> int:
    if len(argv) < 2:
        print("usage: pcbreader.py model.pcb [x1 ... xd]",
              file=sys.stderr)
        return 2
    try:
        obj = read_pcb(argv[1])
    except (PcbError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    kind = type(obj).__name__
    if len(argv) == 2:
        print(f"{kind}: d={obj.num_dimensions}, n_nodes={obj.n_nodes}, "
              f"domain={list(zip(obj.domain_lo, obj.domain_hi))}")
        return 0
    coords = [float(x) for x in argv[2:]]
    if len(coords) != obj.num_dimensions:
        print(f"error: file is {obj.num_dimensions}-D but "
              f"{len(coords)} coords given", file=sys.stderr)
        return 1
    print(f"{obj.evaluate(coords):.17g}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
