// CLI: evaluate a .pcb file (Approximation or Spline) at a query point.
//
//   pcb_eval model.pcb x0 x1 ... x{d-1}
//
// Prints the value with %.17g (matches the Python implementation to
// ~1e-15 relative).

#include <cstdio>
#include <cstdlib>
#include <exception>
#include <vector>

#include "pcb_reader.hpp"

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "Usage: %s file.pcb x0 [x1 ...]\n", argv[0]);
    return 2;
  }
  try {
    pcb::PcbFile f = pcb::read_pcb(argv[1]);
    int d = (f.class_tag == pcb::kClassTagApprox)
                ? static_cast<int>(f.approx.num_dimensions)
                : static_cast<int>(f.spline.num_dimensions);
    if (argc - 2 != d) {
      std::fprintf(stderr, "file is %d-D but %d query coords given\n", d,
                   argc - 2);
      return 1;
    }
    std::vector<double> pt(d);
    for (int i = 0; i < d; i++) pt[i] = std::atof(argv[2 + i]);
    std::printf("%.17g\n", pcb::eval(f, pt));
    return 0;
  } catch (const pcb::PcbError& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  } catch (const std::exception& e) {
    // e.g. bad_alloc/length_error from a hostile file: fail cleanly
    // instead of std::terminate.
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
}
