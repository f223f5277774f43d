// C ABI over pcb_reader for ctypes / FFI embedding.
//
// Handle-based: pcb_load() parses a file and returns an opaque handle;
// pcb_eval() evaluates; errors set a per-thread message retrievable via
// pcb_last_error().  All functions return 0 / NULL on failure.

#include <cstring>
#include <string>
#include <vector>

#include "pcb_reader.hpp"

namespace {
thread_local std::string g_last_error;

void set_error(const std::string& msg) { g_last_error = msg; }
}  // namespace

extern "C" {

void* pcb_load(const char* path) {
  try {
    return new pcb::PcbFile(pcb::read_pcb(path));
  } catch (const std::exception& e) {
    set_error(e.what());
    return nullptr;
  }
}

void* pcb_load_bytes(const uint8_t* data, size_t size) {
  try {
    return new pcb::PcbFile(pcb::read_pcb_from_bytes(data, size));
  } catch (const std::exception& e) {
    set_error(e.what());
    return nullptr;
  }
}

void pcb_free(void* handle) {
  delete static_cast<pcb::PcbFile*>(handle);
}

int pcb_class_tag(void* handle) {
  if (!handle) return -1;
  return static_cast<pcb::PcbFile*>(handle)->class_tag;
}

int pcb_num_dimensions(void* handle) {
  if (!handle) return -1;
  const auto* f = static_cast<pcb::PcbFile*>(handle);
  return (f->class_tag == pcb::kClassTagApprox)
             ? static_cast<int>(f->approx.num_dimensions)
             : static_cast<int>(f->spline.num_dimensions);
}

// Evaluates at `point` (length = num_dimensions); writes the result to
// *out.  Returns 0 on success, -1 on error.
int pcb_eval(void* handle, const double* point, int d, double* out) {
  if (!handle || !point || !out) {
    set_error("null argument");
    return -1;
  }
  if (d < 0) {
    set_error("negative dimensionality");
    return -1;
  }
  try {
    std::vector<double> pt(point, point + d);
    *out = pcb::eval(*static_cast<pcb::PcbFile*>(handle), pt);
    return 0;
  } catch (const std::exception& e) {
    set_error(e.what());
    return -1;
  }
}

// Batched evaluation: points is row-major (n, d); out has n entries.
int pcb_eval_batch(void* handle, const double* points, int n, int d,
                   double* out) {
  if (!handle || !points || !out) {
    set_error("null argument");
    return -1;
  }
  if (n < 0 || d < 0) {
    set_error("negative batch shape");
    return -1;
  }
  try {
    const auto* f = static_cast<pcb::PcbFile*>(handle);
    std::vector<double> pt(d);
    for (int i = 0; i < n; i++) {
      std::memcpy(pt.data(), points + static_cast<size_t>(i) * d,
                  d * sizeof(double));
      out[i] = pcb::eval(*f, pt);
    }
    return 0;
  } catch (const std::exception& e) {
    set_error(e.what());
    return -1;
  }
}

const char* pcb_last_error() { return g_last_error.c_str(); }

}  // extern "C"
