"""Byte-level .pcb format tests: header constants, size accounting,
adversarial corrupt inputs, dtype strictness, round-trips."""

import io
import math
import struct

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSpline
from pychebyshev_tpu.utils import binary


def build_approx_2d():
    cheb = ChebyshevApproximation(
        lambda x, _: math.sin(x[0]) + x[1] ** 2, 2,
        [[-1.0, 1.0], [0.0, 2.0]], [5, 7])
    cheb.build(verbose=False)
    return cheb


def build_spline_1d():
    sp = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1.0, 1.0]], [5],
                         [[0.0]])
    sp.build(verbose=False)
    return sp


def approx_bytes(cheb=None):
    cheb = cheb or build_approx_2d()
    buf = io.BytesIO()
    binary.write_approx(buf, cheb)
    return bytearray(buf.getvalue())


def spline_bytes():
    buf = io.BytesIO()
    binary.write_spline(buf, build_spline_1d())
    return bytearray(buf.getvalue())


class TestHeader:
    def test_constants(self):
        raw = approx_bytes()
        assert raw[:4] == b"PCB\x00"
        assert raw[4] == 1 and raw[5] == 0            # major.minor
        assert struct.unpack("<H", raw[6:8])[0] == 1  # class tag
        assert raw[8:12] == b"\x00\x00\x00\x00"       # reserved

    def test_spline_class_tag(self):
        raw = spline_bytes()
        assert struct.unpack("<H", raw[6:8])[0] == 2

    def test_exact_size_approx(self):
        raw = approx_bytes()
        d = 2
        expected = 12 + 4 + 8 * d + 8 * d + 4 * d + 8 * (5 * 7)
        assert len(raw) == expected

    def test_exact_size_spline(self):
        raw = spline_bytes()
        # header + d + lo + hi + n_nodes + num_knots + knots + num_pieces
        # + 2 pieces of 5 floats
        expected = 12 + 4 + 8 + 8 + 4 + 4 + 8 + 4 + 2 * 5 * 8
        assert len(raw) == expected

    def test_peek_format_version(self, tmp_path):
        p = tmp_path / "x.pcb"
        p.write_bytes(bytes(approx_bytes()))
        assert binary.peek_format_version(str(p)) == 1
        short = tmp_path / "short.pcb"
        short.write_bytes(b"PCB\x00\x01")
        with pytest.raises(ValueError, match="header"):
            binary.peek_format_version(str(short))
        bad = tmp_path / "bad.pcb"
        bad.write_bytes(b"XXXX" + b"\x00" * 20)
        with pytest.raises(ValueError, match="magic"):
            binary.peek_format_version(str(bad))

    def test_detect_format(self, tmp_path):
        p = tmp_path / "b.pcb"
        p.write_bytes(bytes(approx_bytes()))
        assert binary.detect_format(p) == "binary"
        q = tmp_path / "p.pkl"
        q.write_bytes(b"\x80\x05 pickle-ish")
        assert binary.detect_format(q) == "pickle"
        tiny = tmp_path / "tiny"
        tiny.write_bytes(b"ab")
        assert binary.detect_format(tiny) == "pickle"


class TestAdversarialInputs:
    def _read(self, raw):
        return binary.read_approx(io.BytesIO(bytes(raw)))

    def test_bad_magic(self):
        raw = approx_bytes()
        raw[0] = ord("X")
        with pytest.raises(ValueError, match="magic"):
            self._read(raw)

    def test_unsupported_major(self):
        raw = approx_bytes()
        raw[4] = 9
        with pytest.raises(ValueError, match="major"):
            self._read(raw)

    def test_nonzero_reserved(self):
        raw = approx_bytes()
        raw[10] = 1
        with pytest.raises(ValueError, match="reserved"):
            self._read(raw)

    def test_wrong_class_tag(self):
        raw = approx_bytes()
        with pytest.raises(ValueError, match="class_tag"):
            binary.read_spline(io.BytesIO(bytes(raw)))
        raw2 = spline_bytes()
        with pytest.raises(ValueError, match="class_tag"):
            binary.read_approx(io.BytesIO(bytes(raw2)))

    def test_truncated_header(self):
        with pytest.raises(ValueError, match="EOF"):
            self._read(approx_bytes()[:8])

    def test_truncated_body(self):
        raw = approx_bytes()
        with pytest.raises(ValueError, match="EOF"):
            self._read(raw[:-17])

    def test_zero_dimensions(self):
        raw = bytearray(b"PCB\x00\x01\x00\x01\x00\x00\x00\x00\x00")
        raw += struct.pack("<I", 0)
        with pytest.raises(ValueError, match="num_dimensions"):
            self._read(raw)

    def test_inverted_domain(self):
        raw = bytearray(b"PCB\x00\x01\x00\x01\x00\x00\x00\x00\x00")
        raw += struct.pack("<I", 1)
        raw += struct.pack("<d", 1.0)   # lo
        raw += struct.pack("<d", -1.0)  # hi (inverted)
        raw += struct.pack("<I", 3)
        raw += struct.pack("<3d", 0.0, 0.0, 0.0)
        with pytest.raises(ValueError, match="lo"):
            self._read(raw)

    def test_zero_n_nodes(self):
        raw = bytearray(b"PCB\x00\x01\x00\x01\x00\x00\x00\x00\x00")
        raw += struct.pack("<I", 1)
        raw += struct.pack("<d", -1.0)
        raw += struct.pack("<d", 1.0)
        raw += struct.pack("<I", 0)
        with pytest.raises(ValueError, match="n_nodes"):
            self._read(raw)

    def test_unsorted_spline_knots(self):
        raw = bytearray(b"PCB\x00\x01\x00\x02\x00\x00\x00\x00\x00")
        raw += struct.pack("<I", 1)
        raw += struct.pack("<d", -1.0)
        raw += struct.pack("<d", 1.0)
        raw += struct.pack("<I", 3)        # n_nodes
        raw += struct.pack("<I", 2)        # num_knots
        raw += struct.pack("<2d", 0.5, -0.5)  # unsorted
        with pytest.raises(ValueError, match="ascending"):
            binary.read_spline(io.BytesIO(bytes(raw)))

    def test_piece_count_mismatch(self):
        raw = bytearray(b"PCB\x00\x01\x00\x02\x00\x00\x00\x00\x00")
        raw += struct.pack("<I", 1)
        raw += struct.pack("<d", -1.0)
        raw += struct.pack("<d", 1.0)
        raw += struct.pack("<I", 3)
        raw += struct.pack("<I", 1)
        raw += struct.pack("<d", 0.0)
        raw += struct.pack("<I", 5)   # should be 2
        with pytest.raises(ValueError, match="num_pieces"):
            binary.read_spline(io.BytesIO(bytes(raw)))


class TestWriterStrictness:
    def test_u32_dtype_strict(self):
        with pytest.raises(TypeError, match="uint32"):
            binary._emit_array(io.BytesIO(),
                               np.array([1, 2], dtype=np.int64), np.uint32)

    def test_f64_dtype_strict(self):
        with pytest.raises(TypeError, match="float64"):
            binary._emit_array(io.BytesIO(),
                               np.array([1.0], dtype=np.float32), np.float64)

    def test_additional_data_rejected(self):
        cheb = build_approx_2d()
        cheb.additional_data = {"x": 1}
        with pytest.raises(NotImplementedError, match="additional_data"):
            binary.write_approx(io.BytesIO(), cheb)

    def test_unbuilt_rejected(self):
        cheb = ChebyshevApproximation(lambda x, _: x[0], 1, [[-1, 1]],
                                      [5])
        with pytest.raises(RuntimeError):
            binary.write_approx(io.BytesIO(), cheb)


class TestRoundTrip:
    def test_values_bit_exact(self):
        cheb = build_approx_2d()
        loaded = binary.read_approx(io.BytesIO(bytes(approx_bytes(cheb))))
        np.testing.assert_array_equal(np.asarray(loaded.tensor_values),
                                      np.asarray(cheb.tensor_values))
        assert loaded.n_nodes == cheb.n_nodes
        assert [list(b) for b in loaded.domain] == \
            [list(b) for b in cheb.domain]
        assert loaded.function is None

    def test_metadata_drops(self):
        """Binary format drops descriptor / derivative-id registry /
        max_derivative_order (reloads at default)."""
        cheb = build_approx_2d()
        cheb.set_descriptor("will be dropped")
        cheb.get_derivative_id([1, 0])
        loaded = binary.read_approx(io.BytesIO(bytes(approx_bytes(cheb))))
        assert loaded.get_descriptor() == ""
        assert loaded._derivative_id_to_orders == []
        assert loaded.max_derivative_order == 2

    def test_spline_round_trip_eval(self):
        sp = build_spline_1d()
        loaded = binary.read_spline(io.BytesIO(bytes(spline_bytes())))
        for x in [-0.8, -0.1, 0.0, 0.4, 0.99]:
            assert abs(loaded.eval([x], [0]) - sp.eval([x], [0])) < 1e-14


class TestLoadTimeGates:
    """Round-3 hardening: exact piece-count accounting + finite-weight
    rejection of degenerate grids at load."""

    def test_piece_count_int64_wrap_rejected(self):
        # 64 dims x 2 pieces/dim: prod(k+1) = 2^64 wraps an int64
        # accumulator to 0, and a crafted num_pieces=0 would pass a
        # wrapping consistency check.  The reader must account in exact
        # Python ints and reject.
        d = 64
        buf = io.BytesIO()
        buf.write(binary.MAGIC)
        buf.write(struct.pack("<BBH", binary.MAJOR, binary.MINOR,
                              binary.CLASS_TAG_SPLINE))
        buf.write(b"\x00" * 4)
        buf.write(struct.pack("<I", d))
        buf.write(np.zeros(d, dtype="<f8").tobytes())       # lo
        buf.write(np.ones(d, dtype="<f8").tobytes())        # hi
        buf.write(np.full(d, 2, dtype="<u4").tobytes())     # n_nodes
        buf.write(np.ones(d, dtype="<u4").tobytes())        # knot counts
        buf.write(np.full(d, 0.5, dtype="<f8").tobytes())   # knot positions
        buf.write(struct.pack("<I", 0))                     # num_pieces
        buf.seek(0)
        with pytest.raises(ValueError, match="inconsistent"):
            binary.read_spline(buf)

    def test_from_values_degenerate_domain_rejected(self):
        # A 1-ulp-wide domain collapses distinct Chebyshev nodes onto
        # the same f64 values; the barycentric weights go inf/NaN.  The
        # load-time gate must reject instead of warning + NaN evals.
        vals = np.linspace(0.0, 1.0, 5)
        with pytest.raises(ValueError, match="non-finite"):
            ChebyshevApproximation.from_values(
                vals, 1, [[1.0, 1.0 + 2.3e-16]], [5])

    def test_read_approx_degenerate_domain_rejected(self):
        raw = approx_bytes()
        # dim-0 domain -> [1.0, 1.0 + 1 ulp]; header(12) + d(4) = 16.
        struct.pack_into("<d", raw, 16, 1.0)
        struct.pack_into("<d", raw, 32, 1.0 + 2.3e-16)
        with pytest.raises(ValueError, match="non-finite"):
            binary.read_approx(io.BytesIO(bytes(raw)))


class TestGoldenBytes:
    """Exact byte-level golden vectors computed from first principles —
    guards the format against accidental layout drift (behavioral
    parity with reference test_binary_format.py golden-vector class)."""

    def test_approx_2x2_exact_bytes(self):
        cheb = ChebyshevApproximation(
            lambda x, _: x[0] * x[1], 2, [[0.0, 1.0], [0.0, 2.0]], [2, 2])
        cheb.build(verbose=False)
        buf = io.BytesIO()
        binary.write_approx(buf, cheb)
        raw = buf.getvalue()

        expected = bytearray()
        expected += b"PCB\x00" + bytes([1, 0]) + struct.pack("<H", 1)
        expected += b"\x00" * 4
        expected += struct.pack("<I", 2)
        expected += struct.pack("<dd", 0.0, 0.0)     # lo
        expected += struct.pack("<dd", 1.0, 2.0)     # hi
        expected += struct.pack("<II", 2, 2)
        # Type-I nodes for n=2 on [0,1]: 0.5 -/+ 0.5*cos(pi/4)
        c = math.cos(math.pi / 4.0)
        x = [0.5 - 0.5 * c, 0.5 + 0.5 * c]
        y = [1.0 - c, 1.0 + c]
        vals = [x[0] * y[0], x[0] * y[1], x[1] * y[0], x[1] * y[1]]
        expected += struct.pack("<4d", *vals)
        assert raw == bytes(expected)

    def test_round_trip_from_hand_built_bytes(self):
        # Hand-assemble a 1-D file and check the loaded interpolant
        # reproduces its (linear) source exactly.
        n = 3
        lo, hi = -2.0, 2.0
        nodes = [(lo + hi) / 2.0 - (hi - lo) / 2.0
                 * math.cos((2 * k + 1) * math.pi / (2 * n))
                 for k in range(n)]
        vals = [3.0 * t + 1.0 for t in nodes]
        raw = (binary.MAGIC + struct.pack("<BBH", 1, 0, 1) + b"\x00" * 4
               + struct.pack("<I", 1) + struct.pack("<d", lo)
               + struct.pack("<d", hi) + struct.pack("<I", n)
               + struct.pack("<3d", *vals))
        loaded = binary.read_approx(io.BytesIO(raw))
        for t in (-1.9, -0.3, 0.0, 1.2):
            assert abs(loaded.eval([t], [0]) - (3.0 * t + 1.0)) < 1e-14


class TestHeaderVersioning:
    def test_higher_minor_accepted(self):
        raw = approx_bytes()
        raw[5] = 9  # minor bump: same major must stay readable
        loaded = binary.read_approx(io.BytesIO(bytes(raw)))
        assert loaded.num_dimensions == 2

    def test_zero_dimensions_rejected(self):
        raw = approx_bytes()
        struct.pack_into("<I", raw, 12, 0)
        with pytest.raises(ValueError, match="num_dimensions"):
            binary.read_approx(io.BytesIO(bytes(raw)))

    def test_zero_n_nodes_rejected(self):
        raw = approx_bytes()
        # n_nodes block at header(12)+d(4)+lo(16)+hi(16) = 48
        struct.pack_into("<I", raw, 48, 0)
        with pytest.raises(ValueError):
            binary.read_approx(io.BytesIO(bytes(raw)))

    def test_single_node_dim_accepted(self):
        cheb = ChebyshevApproximation(
            lambda x, _: 2.5, 1, [[-1.0, 1.0]], [1])
        cheb.build(verbose=False)
        buf = io.BytesIO()
        binary.write_approx(buf, cheb)
        buf.seek(0)
        loaded = binary.read_approx(buf)
        assert abs(loaded.eval([0.123], [0]) - 2.5) < 1e-15


class TestSaveLoadIntegration:
    def test_save_format_binary_magic(self, tmp_path):
        p = tmp_path / "m.pcb"
        build_approx_2d().save(str(p), format="binary")
        assert p.read_bytes()[:4] == binary.MAGIC

    def test_save_default_pickle(self, tmp_path):
        p = tmp_path / "d.bin"
        build_approx_2d().save(str(p))
        assert p.read_bytes()[:4] != binary.MAGIC

    def test_save_unknown_format_raises(self, tmp_path):
        with pytest.raises(ValueError, match="format"):
            build_approx_2d().save(str(tmp_path / "x"), format="msgpack")

    def test_load_autodetect_both(self, tmp_path):
        cheb = build_approx_2d()
        b, k = tmp_path / "b.pcb", tmp_path / "k.pkl"
        cheb.save(str(b), format="binary")
        cheb.save(str(k), format="pickle")
        for path in (b, k):
            loaded = ChebyshevApproximation.load(str(path))
            assert abs(loaded.eval([0.3, 1.1], [0, 0])
                       - cheb.eval([0.3, 1.1], [0, 0])) < 1e-14

    def test_unbuilt_binary_save_raises(self, tmp_path):
        cheb = ChebyshevApproximation(lambda x, _: x[0], 1, [[-1, 1]], [5])
        with pytest.raises(RuntimeError):
            cheb.save(str(tmp_path / "u.pcb"), format="binary")

    def test_spline_save_load_autodetect(self, tmp_path):
        sp = build_spline_1d()
        p = tmp_path / "s.pcb"
        sp.save(str(p), format="binary")
        loaded = ChebyshevSpline.load(str(p))
        assert abs(loaded.eval([0.4], [0]) - sp.eval([0.4], [0])) < 1e-14


class TestCrossFeatureRoundTrips:
    """Objects produced by every construction path survive the binary
    format (reference TestCrossFeature behaviors, repo-native)."""

    def _rt(self, cheb):
        buf = io.BytesIO()
        binary.write_approx(buf, cheb)
        buf.seek(0)
        return binary.read_approx(buf)

    def test_from_values_built(self):
        src = build_approx_2d()
        fv = ChebyshevApproximation.from_values(
            np.asarray(src.tensor_values), 2, src.domain, src.n_nodes)
        loaded = self._rt(fv)
        assert abs(loaded.eval([0.2, 0.7], [0, 0])
                   - src.eval([0.2, 0.7], [0, 0])) < 1e-14

    def test_algebra_derived(self):
        a = build_approx_2d()
        loaded = self._rt(a + a)
        assert abs(loaded.eval([0.5, 1.5], [0, 0])
                   - 2 * a.eval([0.5, 1.5], [0, 0])) < 1e-13

    def test_extruded(self):
        a = build_approx_2d()
        loaded = self._rt(a.extrude((2, (0.0, 1.0), 4)))
        assert abs(loaded.eval([0.5, 1.5, 0.3], [0, 0, 0])
                   - a.eval([0.5, 1.5], [0, 0])) < 1e-13

    def test_sliced(self):
        a = build_approx_2d()
        loaded = self._rt(a.slice((1, 1.0)))
        assert abs(loaded.eval([0.5], [0])
                   - a.eval([0.5, 1.0], [0, 0])) < 1e-13

    def test_error_estimate_recomputed_after_load(self):
        a = build_approx_2d()
        est = self._rt(a).error_estimate()
        assert np.isfinite(est) and abs(est - a.error_estimate()) < 1e-12


class TestCursorPrimitives:
    """Typed field reader primitives: round trips and truncation at
    every primitive (behavioral parity with the reference low-level
    helper suite, expressed against this repo's _Cursor idiom)."""

    def test_u32_round_trip(self):
        buf = io.BytesIO(struct.pack("<I", 3_000_000_000))
        assert binary._Cursor(buf).u32("x") == 3_000_000_000

    def test_u32s_round_trip(self):
        arr = np.array([0, 1, 7, 2**32 - 1], dtype=np.uint32)
        buf = io.BytesIO()
        binary._emit_array(buf, arr, np.uint32)
        buf.seek(0)
        out = binary._Cursor(buf).u32s(4, "x")
        assert out.dtype == np.uint32
        np.testing.assert_array_equal(out, arr)

    def test_f64s_round_trip_bit_exact(self):
        arr = np.array([0.1, -1e300, 5e-324, math.pi], dtype=np.float64)
        buf = io.BytesIO()
        binary._emit_array(buf, arr, np.float64)
        buf.seek(0)
        out = binary._Cursor(buf).f64s(4, "x")
        assert out.tobytes() == arr.tobytes()

    def test_u32_truncated(self):
        with pytest.raises(ValueError, match="EOF"):
            binary._Cursor(io.BytesIO(b"\x01\x02")).u32("field_name")

    def test_u32s_truncated(self):
        with pytest.raises(ValueError, match="EOF"):
            binary._Cursor(io.BytesIO(b"\x00" * 7)).u32s(2, "x")

    def test_f64s_truncated(self):
        with pytest.raises(ValueError, match="EOF"):
            binary._Cursor(io.BytesIO(b"\x00" * 15)).f64s(2, "x")

    def test_error_names_field(self):
        with pytest.raises(ValueError, match="knot positions"):
            binary._Cursor(io.BytesIO(b"")).f64s(1, "knot positions")


class TestDetectFormatEdges:
    def test_short_file_is_pickle(self, tmp_path):
        p = tmp_path / "short"
        p.write_bytes(b"PC")          # shorter than the magic
        assert binary.detect_format(str(p)) == "pickle"

    def test_empty_file_is_pickle(self, tmp_path):
        p = tmp_path / "empty"
        p.write_bytes(b"")
        assert binary.detect_format(str(p)) == "pickle"

    def test_garbage_is_pickle(self, tmp_path):
        p = tmp_path / "garbage"
        p.write_bytes(bytes(np.random.default_rng(0).integers(
            0, 256, 64, dtype=np.uint8)))
        assert binary.detect_format(str(p)) == "pickle"

    def test_magic_prefix_is_binary(self, tmp_path):
        p = tmp_path / "hdr"
        p.write_bytes(binary.MAGIC + b"anything")
        assert binary.detect_format(str(p)) == "binary"


class TestLoadedDerivatives:
    def test_loaded_supports_derivatives(self):
        # Weights/diff matrices are recomputed on load; analytic
        # derivatives must match the original to machine precision.
        cheb = build_approx_2d()
        buf = io.BytesIO(bytes(approx_bytes(cheb)))
        loaded = binary.read_approx(buf)
        for orders in ([1, 0], [0, 1], [2, 0], [1, 1]):
            assert abs(loaded.eval([0.3, 1.2], orders)
                       - cheb.eval([0.3, 1.2], orders)) < 1e-12


class TestSplineGoldenBytes:
    """Spline byte layout from first principles (reference golden-vector
    parity for class_tag 2)."""

    def test_exact_size_formula(self):
        # 1-D |x| spline, 1 knot, 5 nodes/piece, 2 pieces:
        # header + d + lo/hi + n_nodes + num_knots[d] + knots +
        # num_pieces + 2 * 5 f64
        raw = spline_bytes()
        expected = 12 + 4 + 8 + 8 + 4 + 4 + 8 + 4 + 2 * 5 * 8
        assert len(raw) == expected

    def test_knot_block_layout(self):
        raw = bytes(spline_bytes())
        # num_knots for dim 0 sits right after the grid block.
        off = 12 + 4 + 8 + 8 + 4
        assert struct.unpack("<I", raw[off:off + 4])[0] == 1
        assert struct.unpack("<d", raw[off + 4:off + 12])[0] == 0.0
        assert struct.unpack("<I", raw[off + 12:off + 16])[0] == 2

    def test_round_trip_from_hand_built_spline_bytes(self):
        # Hand-assemble a 1-D two-piece spline whose pieces interpolate
        # x+1 on [-1,0] and 1-x on [0,1] (an upside-down kink).
        n = 3

        def nodes_on(lo, hi):
            return [(lo + hi) / 2.0 - (hi - lo) / 2.0
                    * math.cos((2 * k + 1) * math.pi / (2 * n))
                    for k in range(n)]

        left = [t + 1.0 for t in nodes_on(-1.0, 0.0)]
        right = [1.0 - t for t in nodes_on(0.0, 1.0)]
        raw = (binary.MAGIC + struct.pack("<BBH", 1, 0, 2) + b"\x00" * 4
               + struct.pack("<I", 1)
               + struct.pack("<d", -1.0) + struct.pack("<d", 1.0)
               + struct.pack("<I", n)
               + struct.pack("<I", 1) + struct.pack("<d", 0.0)
               + struct.pack("<I", 2)
               + struct.pack("<3d", *left) + struct.pack("<3d", *right))
        loaded = binary.read_spline(io.BytesIO(raw))
        for t in (-0.9, -0.2, 0.3, 0.95):
            assert abs(loaded.eval([t], [0]) - (1.0 - abs(t))) < 1e-14

    def test_empty_knot_dim_round_trips(self):
        # One dim kinked, one smooth (zero knots): the knot block for
        # the smooth dim is empty and must round-trip.
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) * (1.0 + 0.1 * x[1]), 2,
            [[-1.0, 1.0], [-1.0, 1.0]], [5, 4], [[0.0], []])
        sp.build(verbose=False)
        buf = io.BytesIO()
        binary.write_spline(buf, sp)
        buf.seek(0)
        loaded = binary.read_spline(buf)
        for pt in ([-0.4, 0.2], [0.6, -0.9]):
            assert abs(loaded.eval(pt, [0, 0])
                       - sp.eval(pt, [0, 0])) < 1e-14

    def test_truncated_inside_knots(self):
        raw = spline_bytes()
        # cut inside the knot positions block
        cut = 12 + 4 + 8 + 8 + 4 + 4 + 4
        with pytest.raises(ValueError, match="knot"):
            binary.read_spline(io.BytesIO(bytes(raw[:cut])))

    def test_truncated_inside_piece_tensor(self):
        raw = spline_bytes()
        with pytest.raises(ValueError, match="piece"):
            binary.read_spline(io.BytesIO(bytes(raw[:-7])))


class TestFiveDimRoundTrip:
    def test_bs5d_binary_round_trip(self, cheb_bs5d):
        buf = io.BytesIO()
        binary.write_approx(buf, cheb_bs5d)
        buf.seek(0)
        loaded = binary.read_approx(buf)
        np.testing.assert_array_equal(
            np.asarray(loaded.tensor_values),
            np.asarray(cheb_bs5d.tensor_values))
        pt = [100.0, 100.0, 1.0, 0.2, 0.03]
        assert abs(loaded.eval(pt, [0] * 5)
                   - cheb_bs5d.eval(pt, [0] * 5)) < 1e-10
        assert abs(loaded.eval(pt, [1, 0, 0, 0, 0])
                   - cheb_bs5d.eval(pt, [1, 0, 0, 0, 0])) < 1e-10


class TestLoadedObjectState:
    """What a binary load deliberately drops or resets (reference
    tests/test_binary_format.py: function-attr, max_derivative_order,
    descriptor rows — the .pcb record stores only grid data)."""

    def test_function_attr_is_none_after_load(self, tmp_path):
        cheb = build_approx_2d()
        p = tmp_path / "m.pcb"
        cheb.save(str(p), format="binary")
        loaded = ChebyshevApproximation.load(str(p))
        assert loaded.function is None
        assert cheb.function is not None  # source object untouched

    def test_max_derivative_order_resets_to_default(self, tmp_path):
        cheb = ChebyshevApproximation(
            lambda x, _: x[0] ** 3, 1, [[-1.0, 1.0]], [8],
            max_derivative_order=4)
        cheb.build(verbose=False)
        p = tmp_path / "m.pcb"
        cheb.save(str(p), format="binary")
        loaded = ChebyshevApproximation.load(str(p))
        assert loaded.max_derivative_order == 2
        # derivatives up to the fresh default still work
        assert abs(loaded.eval([0.5], [2]) - 6 * 0.5) < 1e-9

    def test_descriptor_resets_to_empty(self, tmp_path):
        cheb = build_approx_2d()
        cheb.descriptor = "rates desk / USD vol cube"
        p = tmp_path / "m.pcb"
        cheb.save(str(p), format="binary")
        loaded = ChebyshevApproximation.load(str(p))
        assert loaded.descriptor == ""

    def test_spline_function_attr_is_none_after_load(self, tmp_path):
        sp = build_spline_1d()
        p = tmp_path / "s.pcb"
        sp.save(str(p), format="binary")
        loaded = ChebyshevSpline.load(str(p))
        assert loaded.function is None


class TestSplineFormatRestrictions:
    def test_nested_n_nodes_binary_save_raises(self, tmp_path):
        sp = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1.0, 1.0]],
                             [[6, 6]], knots=[[0.0]])
        sp.build(verbose=False)
        with pytest.raises(NotImplementedError,
                           match="shared n_nodes"):
            sp.save(str(tmp_path / "s.pcb"), format="binary")

    def test_2d_spline_round_trip(self, tmp_path):
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) + x[1] ** 2, 2,
            [[-1.0, 1.0], [0.0, 1.0]], [5, 5], knots=[[0.0], []])
        sp.build(verbose=False)
        p = tmp_path / "s2.pcb"
        sp.save(str(p), format="binary")
        loaded = ChebyshevSpline.load(str(p))
        for pt in ([0.3, 0.5], [-0.7, 0.2], [0.0, 0.9]):
            assert loaded.eval(pt, [0, 0]) == pytest.approx(
                sp.eval(pt, [0, 0]), abs=1e-14)


class TestSingleNodeDimRoundTrip:
    def test_n1_dimension_full_round_trip(self, tmp_path):
        fv = ChebyshevApproximation.from_values(
            np.full((1, 5), 2.0), 2, [[0.0, 1.0], [0.0, 1.0]], [1, 5])
        p = tmp_path / "n1.pcb"
        fv.save(str(p), format="binary")
        loaded = ChebyshevApproximation.load(str(p))
        assert loaded.n_nodes == [1, 5]
        assert loaded.vectorized_eval([0.5, 0.3], [0, 0]) == \
            pytest.approx(2.0, abs=1e-12)
