// Unit tests for pcb_reader: synthetic-byte corruption cases + fixture
// round-trips.  Assert-based (no framework dependency); exits nonzero on
// the first failure.
//
//   test_pcb_reader [fixtures_dir]
//
// When a fixtures dir is given, reads approx_2d_simple.pcb /
// approx_5d_bs.pcb / spline_1d_kink.pcb and checks structure + known
// evaluation values written alongside as *.expected text files
// ("x0 x1 ... expected_value" per line).

#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "pcb_reader.hpp"

static int g_failures = 0;

#define CHECK(cond)                                                     \
  do {                                                                  \
    if (!(cond)) {                                                      \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__,      \
                   #cond);                                              \
      g_failures++;                                                     \
    }                                                                   \
  } while (0)

#define CHECK_THROWS_CODE(expr, expected_code)                          \
  do {                                                                  \
    bool threw = false;                                                 \
    try {                                                               \
      (void)(expr);                                                     \
    } catch (const pcb::PcbError& e) {                                  \
      threw = true;                                                     \
      if (e.code() != (expected_code)) {                                \
        std::fprintf(stderr, "FAIL %s:%d: wrong error code for %s\n",   \
                     __FILE__, __LINE__, #expr);                        \
        g_failures++;                                                   \
      }                                                                 \
    }                                                                   \
    if (!threw) {                                                       \
      std::fprintf(stderr, "FAIL %s:%d: %s did not throw\n", __FILE__,  \
                   __LINE__, #expr);                                    \
      g_failures++;                                                     \
    }                                                                   \
  } while (0)

namespace {

void push_u32(std::vector<uint8_t>& b, uint32_t v) {
  for (int i = 0; i < 4; i++) b.push_back((v >> (8 * i)) & 0xff);
}

void push_f64(std::vector<uint8_t>& b, double v) {
  uint64_t bits;
  std::memcpy(&bits, &v, 8);
  for (int i = 0; i < 8; i++) b.push_back((bits >> (8 * i)) & 0xff);
}

std::vector<uint8_t> header(uint8_t major, uint16_t tag) {
  std::vector<uint8_t> b = {'P', 'C', 'B', '\0', major, 0};
  b.push_back(tag & 0xff);
  b.push_back((tag >> 8) & 0xff);
  for (int i = 0; i < 4; i++) b.push_back(0);
  return b;
}

// A minimal valid 1-D approximation of f(x) = x on [-1, 1], 3 nodes.
std::vector<uint8_t> tiny_approx_bytes() {
  std::vector<uint8_t> b = header(1, 1);
  push_u32(b, 1);       // d
  push_f64(b, -1.0);    // lo
  push_f64(b, 1.0);     // hi
  push_u32(b, 3);       // n_nodes
  auto nodes = pcb::make_nodes(-1.0, 1.0, 3);
  for (double x : nodes) push_f64(b, x);  // values = identity
  return b;
}

void test_synthetic_errors() {
  // bad magic
  {
    auto b = tiny_approx_bytes();
    b[0] = 'X';
    CHECK_THROWS_CODE(pcb::read_pcb_from_bytes(b.data(), b.size()),
                      pcb::ErrorCode::InvalidMagic);
  }
  // unsupported major version
  {
    auto b = tiny_approx_bytes();
    b[4] = 9;
    CHECK_THROWS_CODE(pcb::read_pcb_from_bytes(b.data(), b.size()),
                      pcb::ErrorCode::UnsupportedVersion);
  }
  // nonzero reserved
  {
    auto b = tiny_approx_bytes();
    b[9] = 1;
    CHECK_THROWS_CODE(pcb::read_pcb_from_bytes(b.data(), b.size()),
                      pcb::ErrorCode::NonzeroReserved);
  }
  // unknown class tag
  {
    auto b = tiny_approx_bytes();
    b[6] = 7;
    CHECK_THROWS_CODE(pcb::read_pcb_from_bytes(b.data(), b.size()),
                      pcb::ErrorCode::UnknownClassTag);
  }
  // truncated body
  {
    auto b = tiny_approx_bytes();
    b.resize(b.size() - 5);
    CHECK_THROWS_CODE(pcb::read_pcb_from_bytes(b.data(), b.size()),
                      pcb::ErrorCode::Truncated);
  }
  // zero dimensions
  {
    auto b = header(1, 1);
    push_u32(b, 0);
    CHECK_THROWS_CODE(pcb::read_pcb_from_bytes(b.data(), b.size()),
                      pcb::ErrorCode::InvalidField);
  }
  // inverted domain
  {
    auto b = header(1, 1);
    push_u32(b, 1);
    push_f64(b, 1.0);   // lo
    push_f64(b, -1.0);  // hi (inverted)
    push_u32(b, 3);
    for (int i = 0; i < 3; i++) push_f64(b, 0.0);
    CHECK_THROWS_CODE(pcb::read_pcb_from_bytes(b.data(), b.size()),
                      pcb::ErrorCode::InvalidField);
  }
  // tensor-size product overflows size_t (8 dims x 100000 nodes):
  // must be rejected as InvalidField, not under-allocated or thrown
  // from the allocator.
  {
    auto b = header(1, 1);
    push_u32(b, 8);
    for (int i = 0; i < 8; i++) push_f64(b, -1.0);
    for (int i = 0; i < 8; i++) push_f64(b, 1.0);
    for (int i = 0; i < 8; i++) push_u32(b, 100000);
    CHECK_THROWS_CODE(pcb::read_pcb_from_bytes(b.data(), b.size()),
                      pcb::ErrorCode::InvalidField);
  }
  // spline with unsorted knots
  {
    auto b = header(1, 2);
    push_u32(b, 1);
    push_f64(b, -1.0);
    push_f64(b, 1.0);
    push_u32(b, 3);      // n_nodes
    push_u32(b, 2);      // num_knots
    push_f64(b, 0.5);    // knots out of order
    push_f64(b, -0.5);
    CHECK_THROWS_CODE(pcb::read_pcb_from_bytes(b.data(), b.size()),
                      pcb::ErrorCode::InvalidField);
  }
}

void test_tiny_eval() {
  auto b = tiny_approx_bytes();
  pcb::PcbFile f = pcb::read_pcb_from_bytes(b.data(), b.size());
  CHECK(f.class_tag == pcb::kClassTagApprox);
  CHECK(f.approx.num_dimensions == 1);
  // Interpolant of identity values reproduces x exactly (degree 1 < 3).
  for (double x : {-0.9, -0.25, 0.0, 0.6, 0.99}) {
    double v = pcb::eval(f, {x});
    CHECK(std::fabs(v - x) < 1e-14);
  }
  // Exact node hit.
  auto nodes = pcb::make_nodes(-1.0, 1.0, 3);
  CHECK(std::fabs(pcb::eval(f, {nodes[1]}) - nodes[1]) < 1e-15);
}

void test_fixture(const std::string& dir, const std::string& name,
                  uint16_t expected_tag) {
  std::string path = dir + "/" + name + ".pcb";
  pcb::PcbFile f = pcb::read_pcb(path);
  CHECK(f.class_tag == expected_tag);
  CHECK(pcb::peek_format_version(path) == 1);

  std::ifstream exp(dir + "/" + name + ".expected");
  CHECK(static_cast<bool>(exp));
  std::string line;
  int checked = 0;
  while (std::getline(exp, line)) {
    if (line.empty()) continue;
    std::istringstream ss(line);
    std::vector<double> vals;
    double v;
    while (ss >> v) vals.push_back(v);
    CHECK(vals.size() >= 2);
    double expected = vals.back();
    vals.pop_back();
    double got = pcb::eval(f, vals);
    double scale = std::max(std::fabs(expected), 1.0);
    if (std::fabs(got - expected) / scale > 1e-12) {
      std::fprintf(stderr, "FAIL fixture %s: got %.17g expected %.17g\n",
                   name.c_str(), got, expected);
      g_failures++;
    }
    checked++;
  }
  CHECK(checked > 0);
}

}  // namespace

int main(int argc, char** argv) {
  test_synthetic_errors();
  test_tiny_eval();
  if (argc > 1) {
    std::string dir = argv[1];
    test_fixture(dir, "approx_2d_simple", pcb::kClassTagApprox);
    test_fixture(dir, "approx_5d_bs", pcb::kClassTagApprox);
    test_fixture(dir, "spline_1d_kink", pcb::kClassTagSpline);
  }
  if (g_failures == 0) {
    std::printf("test_pcb_reader: all tests passed\n");
    return 0;
  }
  std::fprintf(stderr, "test_pcb_reader: %d failure(s)\n", g_failures);
  return 1;
}
