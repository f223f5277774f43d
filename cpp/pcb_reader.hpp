// pcb_reader: C++17 reader + evaluator for the portable PyChebyshev
// `.pcb` binary format (v1).
//
// Native-language counterpart of the pychebyshev_tpu Python library:
// parses ChebyshevApproximation (class_tag 1) and ChebyshevSpline
// (class_tag 2) files or byte buffers into plain structs, and evaluates
// them at query points by regenerating the Chebyshev Type-I grid and
// barycentric weights from the stored metadata (values match the Python
// implementation to ~1e-15 relative).
//
// Capability-parity targets from the reference repo (behavior, not code):
//   readers/rust/src/lib.rs       — typed-error parsing surface
//   readers/julia/src/PCBReader.jl — same parse surface
//   examples/binary_reader/reader.c — parse + dimensional-collapse eval
// extended here with full spline routing + evaluation and a C ABI
// (pcb_capi.cpp) for ctypes embedding.

#pragma once

#include <cstdint>
#include <stdexcept>
#include <string>
#include <vector>

namespace pcb {

enum class ErrorCode {
  InvalidMagic,
  UnsupportedVersion,
  NonzeroReserved,
  UnknownClassTag,
  Truncated,
  InvalidField,
  Io,
};

class PcbError : public std::runtime_error {
 public:
  PcbError(ErrorCode code, const std::string& msg)
      : std::runtime_error(msg), code_(code) {}
  ErrorCode code() const { return code_; }

 private:
  ErrorCode code_;
};

struct Approximation {
  uint32_t num_dimensions = 0;
  std::vector<double> domain_lo;
  std::vector<double> domain_hi;
  std::vector<uint32_t> n_nodes;
  std::vector<double> tensor_values;  // C-order, prod(n_nodes) entries
  // Grid cache filled at parse time (eval falls back to computing it
  // when empty, e.g. for hand-built structs): per-dim Chebyshev nodes
  // and barycentric weights — the O(n^2) weight build must not re-run
  // per query.
  std::vector<std::vector<double>> nodes;
  std::vector<std::vector<double>> weights;
};

struct Spline {
  uint32_t num_dimensions = 0;
  std::vector<double> domain_lo;
  std::vector<double> domain_hi;
  std::vector<uint32_t> n_nodes;               // flat, shared across pieces
  std::vector<std::vector<double>> knots;      // per-dim interior knots
  std::vector<std::vector<double>> pieces;     // C-order piece tensors
  // Grid cache filled at parse time (see Approximation): per dim, per
  // sub-interval — interval_nodes[d][j] are the nodes of dim d's j-th
  // piece interval; ditto interval_weights.
  std::vector<std::vector<std::vector<double>>> interval_nodes;
  std::vector<std::vector<std::vector<double>>> interval_weights;
};

struct PcbFile {
  uint16_t class_tag = 0;  // 1 = Approximation, 2 = Spline
  Approximation approx;    // valid when class_tag == 1
  Spline spline;           // valid when class_tag == 2
};

constexpr uint16_t kClassTagApprox = 1;
constexpr uint16_t kClassTagSpline = 2;

// ---- Parsing -------------------------------------------------------------
PcbFile read_pcb(const std::string& path);
PcbFile read_pcb_from_bytes(const uint8_t* data, size_t size);

// Header-only peek: returns the major format version.
int peek_format_version(const std::string& path);

// ---- Evaluation ----------------------------------------------------------
// Barycentric evaluation via dimensional collapse (highest dim first).
double eval(const Approximation& a, const std::vector<double>& point);
// Piece routing (knot boundaries go to the right piece) + piece eval.
double eval(const Spline& s, const std::vector<double>& point);
double eval(const PcbFile& f, const std::vector<double>& point);

// ---- Grid helpers (exposed for tests) ------------------------------------
// Chebyshev Type-I nodes scaled to [lo, hi], ascending.
std::vector<double> make_nodes(double lo, double hi, uint32_t n);
// Barycentric weights w_i = 1 / prod_{j != i} (x_i - x_j).
std::vector<double> barycentric_weights(const std::vector<double>& nodes);

}  // namespace pcb
