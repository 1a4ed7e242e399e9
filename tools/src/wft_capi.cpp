// C ABI for Python ctypes bindings (warmup_fir_filter_tpu/native.py).
//
// The binding layer the reference never had (its C++ test target was
// broken mid-migration, SURVEY.md §4.3); pybind11 is unavailable in this
// environment, so a plain extern-"C" surface + ctypes is the chosen
// Python↔C++ bridge.
#include <cstdint>
#include <vector>

#include "wft_complex.h"
#include "wft_fir.h"

extern "C" {

// ---- fixed golden over rows -------------------------------------------
int wft_fir1d_fixed_rows(const std::uint8_t* x, std::int64_t batch,
                         std::int64_t width, const std::int64_t* taps_fixed,
                         std::int64_t num_taps, int coeff_bits, int frac_bits,
                         int acc_bits, std::uint8_t* out) {
  if (x == nullptr || taps_fixed == nullptr || out == nullptr ||
      batch < 0 || width < 0 || num_taps <= 0 || frac_bits <= 0 ||
      acc_bits <= 0) {
    return 1;
  }
  wft::QFormatSpec spec{coeff_bits, frac_bits, acc_bits};
  wft::fir1d_fixed_rows(x, batch, width, taps_fixed, num_taps, spec, out);
  return 0;
}

// ---- streaming float FIR ----------------------------------------------
void* wft_stream_create(const double* taps, std::int64_t num_taps) {
  if (taps == nullptr || num_taps <= 0) return nullptr;
  return new wft::Fir1DStream(std::vector<double>(taps, taps + num_taps));
}

void wft_stream_destroy(void* handle) {
  delete static_cast<wft::Fir1DStream*>(handle);
}

void wft_stream_reset(void* handle) {
  static_cast<wft::Fir1DStream*>(handle)->reset();
}

void wft_stream_process(void* handle, const double* x, std::int64_t n,
                        double* out) {
  auto* stream = static_cast<wft::Fir1DStream*>(handle);
  for (std::int64_t i = 0; i < n; ++i) out[i] = stream->process_sample(x[i]);
}

// ---- bit compare -------------------------------------------------------
void wft_bit_compare_u8(const std::uint8_t* a, const std::uint8_t* b,
                        std::int64_t n, std::int64_t* num_mismatches,
                        std::int64_t* max_abs_err, double* mae,
                        double* rmse) {
  const wft::CompareResult result = wft::bit_compare_u8(a, b, n);
  *num_mismatches = result.num_mismatches;
  *max_abs_err = result.max_abs_err;
  *mae = result.mae;
  *rmse = result.rmse;
}

// ---- FFT ---------------------------------------------------------------
int wft_fft_radix2(double* re, double* im, std::int64_t n, int inverse) {
  if ((n & (n - 1)) != 0 || n <= 0) return 1;
  std::vector<wft::Complex> data(static_cast<std::size_t>(n));
  for (std::int64_t i = 0; i < n; ++i) data[i] = wft::Complex(re[i], im[i]);
  wft::fft_radix2(data, inverse != 0);
  for (std::int64_t i = 0; i < n; ++i) {
    re[i] = data[i].re;
    im[i] = data[i].im;
  }
  return 0;
}

}  // extern "C"
