#include "pcb_reader.hpp"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <fstream>

namespace pcb {

namespace {

constexpr double kPi = 3.14159265358979323846;
constexpr double kNodeTol = 1e-14;  // node-coincidence tolerance

// Little-endian cursor over a byte buffer with typed-error reads.
class Cursor {
 public:
  Cursor(const uint8_t* data, size_t size) : data_(data), size_(size) {}

  size_t remaining() const { return size_ - pos_; }

  void require(size_t n, const char* what) const {
    if (pos_ + n > size_) {
      throw PcbError(ErrorCode::Truncated,
                     std::string("unexpected EOF reading ") + what);
    }
  }

  uint8_t u8(const char* what) {
    require(1, what);
    return data_[pos_++];
  }

  uint16_t u16(const char* what) {
    require(2, what);
    uint16_t v = static_cast<uint16_t>(data_[pos_]) |
                 (static_cast<uint16_t>(data_[pos_ + 1]) << 8);
    pos_ += 2;
    return v;
  }

  uint32_t u32(const char* what) {
    require(4, what);
    uint32_t v = 0;
    for (int i = 0; i < 4; i++) {
      v |= static_cast<uint32_t>(data_[pos_ + i]) << (8 * i);
    }
    pos_ += 4;
    return v;
  }

  double f64(const char* what) {
    require(8, what);
    uint64_t bits = 0;
    for (int i = 0; i < 8; i++) {
      bits |= static_cast<uint64_t>(data_[pos_ + i]) << (8 * i);
    }
    pos_ += 8;
    double out;
    std::memcpy(&out, &bits, sizeof(out));
    return out;
  }

  std::vector<double> f64_array(size_t count, const char* what) {
    if (count > size_ / 8) {  // also guards the count*8 multiply
      throw PcbError(ErrorCode::Truncated,
                     std::string("unexpected EOF reading ") + what);
    }
    require(count * 8, what);
    std::vector<double> out(count);
    for (size_t i = 0; i < count; i++) out[i] = f64(what);
    return out;
  }

  std::vector<uint32_t> u32_array(size_t count, const char* what) {
    if (count > size_ / 4) {  // also guards the count*4 multiply
      throw PcbError(ErrorCode::Truncated,
                     std::string("unexpected EOF reading ") + what);
    }
    require(count * 4, what);
    std::vector<uint32_t> out(count);
    for (size_t i = 0; i < count; i++) out[i] = u32(what);
    return out;
  }

 private:
  const uint8_t* data_;
  size_t size_;
  size_t pos_ = 0;
};

uint16_t read_header(Cursor& c) {
  static const uint8_t kMagic[4] = {'P', 'C', 'B', '\0'};
  uint8_t magic[4];
  for (int i = 0; i < 4; i++) magic[i] = c.u8("magic");
  if (std::memcmp(magic, kMagic, 4) != 0) {
    throw PcbError(ErrorCode::InvalidMagic,
                   "not a PyChebyshev binary file (bad magic)");
  }
  uint8_t major = c.u8("major version");
  c.u8("minor version");
  if (major != 1) {
    throw PcbError(ErrorCode::UnsupportedVersion,
                   "unsupported .pcb major version " +
                       std::to_string(major));
  }
  uint16_t class_tag = c.u16("class_tag");
  for (int i = 0; i < 4; i++) {
    if (c.u8("reserved") != 0) {
      throw PcbError(ErrorCode::NonzeroReserved,
                     "reserved header bytes nonzero");
    }
  }
  return class_tag;
}

void read_common(Cursor& c, uint32_t& d, std::vector<double>& lo,
                 std::vector<double>& hi, std::vector<uint32_t>& n_nodes) {
  d = c.u32("num_dimensions");
  if (d < 1) {
    throw PcbError(ErrorCode::InvalidField, "num_dimensions must be >= 1");
  }
  lo = c.f64_array(d, "domain_lo");
  hi = c.f64_array(d, "domain_hi");
  for (uint32_t i = 0; i < d; i++) {
    if (!(lo[i] < hi[i])) {
      throw PcbError(ErrorCode::InvalidField,
                     "domain lo must be < hi at dim " + std::to_string(i));
    }
  }
  n_nodes = c.u32_array(d, "n_nodes");
  for (uint32_t i = 0; i < d; i++) {
    if (n_nodes[i] < 1) {
      throw PcbError(ErrorCode::InvalidField,
                     "n_nodes must be >= 1 at dim " + std::to_string(i));
    }
  }
}

size_t tensor_size(const std::vector<uint32_t>& n_nodes) {
  // ~1 GiB of f64: rejects wrapped products (and absurd allocations)
  // as a format error instead of letting std::vector throw later.
  constexpr size_t kMaxElems = size_t{1} << 27;
  size_t total = 1;
  for (uint32_t n : n_nodes) {
    if (n == 0 || total > kMaxElems / n) {
      throw PcbError(ErrorCode::InvalidField,
                     "tensor size overflows sane limits");
    }
    total *= n;
  }
  return total;
}

void fill_grid_cache(Approximation& a) {
  a.nodes.resize(a.num_dimensions);
  a.weights.resize(a.num_dimensions);
  for (uint32_t i = 0; i < a.num_dimensions; i++) {
    a.nodes[i] = make_nodes(a.domain_lo[i], a.domain_hi[i], a.n_nodes[i]);
    a.weights[i] = barycentric_weights(a.nodes[i]);
  }
}

void fill_grid_cache(Spline& s) {
  s.interval_nodes.resize(s.num_dimensions);
  s.interval_weights.resize(s.num_dimensions);
  for (uint32_t i = 0; i < s.num_dimensions; i++) {
    const std::vector<double>& k = s.knots[i];
    size_t intervals = k.size() + 1;
    s.interval_nodes[i].resize(intervals);
    s.interval_weights[i].resize(intervals);
    for (size_t j = 0; j < intervals; j++) {
      double lo = (j == 0) ? s.domain_lo[i] : k[j - 1];
      double hi = (j == k.size()) ? s.domain_hi[i] : k[j];
      s.interval_nodes[i][j] = make_nodes(lo, hi, s.n_nodes[i]);
      s.interval_weights[i][j] = barycentric_weights(s.interval_nodes[i][j]);
    }
  }
}

Approximation read_approx_body(Cursor& c) {
  Approximation a;
  read_common(c, a.num_dimensions, a.domain_lo, a.domain_hi, a.n_nodes);
  a.tensor_values = c.f64_array(tensor_size(a.n_nodes), "tensor_values");
  fill_grid_cache(a);
  return a;
}

Spline read_spline_body(Cursor& c) {
  Spline s;
  read_common(c, s.num_dimensions, s.domain_lo, s.domain_hi, s.n_nodes);

  std::vector<uint32_t> num_knots = c.u32_array(s.num_dimensions,
                                                "num_knots");
  size_t total_knots = 0;
  for (uint32_t k : num_knots) total_knots += k;
  std::vector<double> flat = c.f64_array(total_knots, "knots");

  size_t offset = 0;
  size_t expected_pieces = 1;
  s.knots.resize(s.num_dimensions);
  for (uint32_t i = 0; i < s.num_dimensions; i++) {
    s.knots[i].assign(flat.begin() + offset,
                      flat.begin() + offset + num_knots[i]);
    offset += num_knots[i];
    for (size_t j = 1; j < s.knots[i].size(); j++) {
      if (!(s.knots[i][j - 1] < s.knots[i][j])) {
        throw PcbError(ErrorCode::InvalidField,
                       "knots not strictly ascending at dim " +
                           std::to_string(i));
      }
    }
    for (double kn : s.knots[i]) {
      // Library parity: knots must be STRICTLY inside the domain
      // (boundary or exterior knots make degenerate/inverted pieces).
      if (!(s.domain_lo[i] < kn && kn < s.domain_hi[i])) {
        throw PcbError(ErrorCode::InvalidField,
                       "knot not strictly inside domain at dim " +
                           std::to_string(i));
      }
    }
  }

  size_t per_piece = tensor_size(s.n_nodes);
  // Overflow-safe piece accounting with the same total-element cap as
  // tensor_size: a crafted header must neither wrap the product into a
  // spuriously-matching num_pieces nor force a huge allocation.
  constexpr size_t kMaxElems = size_t{1} << 27;
  const size_t max_pieces = kMaxElems / per_piece;
  for (uint32_t i = 0; i < s.num_dimensions; i++) {
    size_t factor = static_cast<size_t>(num_knots[i]) + 1;
    if (expected_pieces > max_pieces / factor) {
      throw PcbError(ErrorCode::InvalidField,
                     "pieces exceed element cap");
    }
    expected_pieces *= factor;
  }

  uint32_t num_pieces = c.u32("num_pieces");
  if (num_pieces != expected_pieces) {
    throw PcbError(ErrorCode::InvalidField,
                   "num_pieces does not match prod(num_knots + 1)");
  }

  s.pieces.reserve(num_pieces);
  for (uint32_t p = 0; p < num_pieces; p++) {
    s.pieces.push_back(c.f64_array(per_piece, "piece tensor"));
  }
  fill_grid_cache(s);
  return s;
}

double bary_collapse(const std::vector<double>& values,
                     const std::vector<uint32_t>& n_nodes,
                     const std::vector<std::vector<double>>& nodes,
                     const std::vector<std::vector<double>>& weights,
                     const std::vector<double>& point) {
  // Collapse highest dim -> lowest via the 1-D barycentric formula.
  std::vector<double> current = values;
  const int d = static_cast<int>(n_nodes.size());
  for (int dim = d - 1; dim >= 0; dim--) {
    const uint32_t nk = n_nodes[dim];
    const size_t outer = current.size() / nk;
    const double x = point[dim];
    const std::vector<double>& nd = nodes[dim];
    const std::vector<double>& w = weights[dim];

    // Exact-node fast path (tolerance matches the Python library).
    int exact = -1;
    for (uint32_t k = 0; k < nk; k++) {
      if (std::fabs(x - nd[k]) < kNodeTol) {
        exact = static_cast<int>(k);
        break;
      }
    }

    std::vector<double> next(outer);
    if (exact >= 0) {
      for (size_t o = 0; o < outer; o++) next[o] = current[o * nk + exact];
    } else {
      // Precompute normalized coefficient row once for this dim.
      std::vector<double> coeff(nk);
      double den = 0.0;
      for (uint32_t k = 0; k < nk; k++) {
        coeff[k] = w[k] / (x - nd[k]);
        den += coeff[k];
      }
      for (uint32_t k = 0; k < nk; k++) coeff[k] /= den;
      for (size_t o = 0; o < outer; o++) {
        double acc = 0.0;
        for (uint32_t k = 0; k < nk; k++) {
          acc += coeff[k] * current[o * nk + k];
        }
        next[o] = acc;
      }
    }
    current.swap(next);
  }
  return current[0];
}

}  // namespace

std::vector<double> make_nodes(double lo, double hi, uint32_t n) {
  std::vector<double> out(n);
  for (uint32_t k = 0; k < n; k++) {
    // -cos((2k+1)pi/(2n)) is Type-I ascending.
    double theta = (2.0 * k + 1.0) * kPi / (2.0 * n);
    out[k] = 0.5 * (lo + hi) - 0.5 * (hi - lo) * std::cos(theta);
  }
  std::sort(out.begin(), out.end());
  return out;
}

std::vector<double> barycentric_weights(const std::vector<double>& nodes) {
  const size_t n = nodes.size();
  std::vector<double> w(n, 1.0);
  for (size_t i = 0; i < n; i++) {
    for (size_t j = 0; j < n; j++) {
      if (j != i) w[i] /= (nodes[i] - nodes[j]);
    }
    // A crafted/collapsed domain can make nodes coincide in f64; the
    // weight blows up to inf/NaN (or underflows to 0) and every query
    // would silently return NaN. Mirror the library's load-time gate.
    if (!std::isfinite(w[i]) || w[i] == 0.0) {
      throw PcbError(ErrorCode::InvalidField,
                     "degenerate grid: coinciding Chebyshev nodes give "
                     "non-finite barycentric weights");
    }
  }
  return w;
}

PcbFile read_pcb_from_bytes(const uint8_t* data, size_t size) {
  Cursor c(data, size);
  uint16_t tag = read_header(c);
  PcbFile out;
  out.class_tag = tag;
  if (tag == kClassTagApprox) {
    out.approx = read_approx_body(c);
  } else if (tag == kClassTagSpline) {
    out.spline = read_spline_body(c);
  } else {
    throw PcbError(ErrorCode::UnknownClassTag,
                   "unknown class_tag " + std::to_string(tag));
  }
  if (c.remaining() != 0) {
    throw PcbError(ErrorCode::InvalidField,
                   std::to_string(c.remaining()) +
                       " trailing bytes after the payload");
  }
  return out;
}

PcbFile read_pcb(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    throw PcbError(ErrorCode::Io, "cannot open file: " + path);
  }
  std::vector<uint8_t> bytes((std::istreambuf_iterator<char>(f)),
                             std::istreambuf_iterator<char>());
  return read_pcb_from_bytes(bytes.data(), bytes.size());
}

int peek_format_version(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    throw PcbError(ErrorCode::Io, "cannot open file: " + path);
  }
  uint8_t header[12];
  f.read(reinterpret_cast<char*>(header), 12);
  if (f.gcount() != 12) {
    throw PcbError(ErrorCode::Truncated,
                   "file shorter than the 12-byte header");
  }
  static const uint8_t kMagic[4] = {'P', 'C', 'B', '\0'};
  if (std::memcmp(header, kMagic, 4) != 0) {
    throw PcbError(ErrorCode::InvalidMagic, "not a .pcb file");
  }
  return header[4];
}

double eval(const Approximation& a, const std::vector<double>& point) {
  if (point.size() != a.num_dimensions) {
    throw PcbError(ErrorCode::InvalidField,
                   "query point has wrong dimensionality");
  }
  if (a.nodes.size() == a.num_dimensions &&
      a.weights.size() == a.num_dimensions) {
    return bary_collapse(a.tensor_values, a.n_nodes, a.nodes, a.weights,
                         point);
  }
  // Hand-built struct without the parse-time cache: compute locally.
  std::vector<std::vector<double>> nodes(a.num_dimensions);
  std::vector<std::vector<double>> weights(a.num_dimensions);
  for (uint32_t i = 0; i < a.num_dimensions; i++) {
    nodes[i] = make_nodes(a.domain_lo[i], a.domain_hi[i], a.n_nodes[i]);
    weights[i] = barycentric_weights(nodes[i]);
  }
  return bary_collapse(a.tensor_values, a.n_nodes, nodes, weights, point);
}

double eval(const Spline& s, const std::vector<double>& point) {
  if (point.size() != s.num_dimensions) {
    throw PcbError(ErrorCode::InvalidField,
                   "query point has wrong dimensionality");
  }
  // Route to the containing piece: a point exactly at a knot goes right
  // (upper_bound == searchsorted side='right').
  size_t flat = 0;
  std::vector<size_t> interval_idx(s.num_dimensions);
  std::vector<std::pair<double, double>> sub_domain(s.num_dimensions);
  for (uint32_t i = 0; i < s.num_dimensions; i++) {
    const std::vector<double>& k = s.knots[i];
    size_t idx = std::upper_bound(k.begin(), k.end(), point[i]) - k.begin();
    if (idx > k.size()) idx = k.size();
    size_t pieces_this_dim = k.size() + 1;
    if (idx >= pieces_this_dim) idx = pieces_this_dim - 1;
    flat = flat * pieces_this_dim + idx;
    interval_idx[i] = idx;
    double lo = (idx == 0) ? s.domain_lo[i] : k[idx - 1];
    double hi = (idx == k.size()) ? s.domain_hi[i] : k[idx];
    sub_domain[i] = {lo, hi};
  }

  if (s.interval_nodes.size() == s.num_dimensions) {
    std::vector<std::vector<double>> nodes(s.num_dimensions);
    std::vector<std::vector<double>> weights(s.num_dimensions);
    for (uint32_t i = 0; i < s.num_dimensions; i++) {
      nodes[i] = s.interval_nodes[i][interval_idx[i]];
      weights[i] = s.interval_weights[i][interval_idx[i]];
    }
    return bary_collapse(s.pieces[flat], s.n_nodes, nodes, weights, point);
  }
  std::vector<std::vector<double>> nodes(s.num_dimensions);
  std::vector<std::vector<double>> weights(s.num_dimensions);
  for (uint32_t i = 0; i < s.num_dimensions; i++) {
    nodes[i] = make_nodes(sub_domain[i].first, sub_domain[i].second,
                          s.n_nodes[i]);
    weights[i] = barycentric_weights(nodes[i]);
  }
  return bary_collapse(s.pieces[flat], s.n_nodes, nodes, weights, point);
}

double eval(const PcbFile& f, const std::vector<double>& point) {
  if (f.class_tag == kClassTagApprox) return eval(f.approx, point);
  if (f.class_tag == kClassTagSpline) return eval(f.spline, point);
  throw PcbError(ErrorCode::UnknownClassTag,
                 "unknown class_tag " + std::to_string(f.class_tag));
}

}  // namespace pcb
