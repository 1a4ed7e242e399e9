#include "wft_fir.h"

#include <algorithm>
#include <cmath>
#include <stdexcept>

namespace wft {

void Fir1DStream::set_taps(const std::vector<double>& taps) {
  if (taps.empty()) {
    throw std::invalid_argument("Fir1DStream: taps must not be empty");
  }
  taps_ = taps;
  reset();
}

void Fir1DStream::reset() { delay_.assign(taps_.size(), 0.0); }

double Fir1DStream::process_sample(double x) {
  // Shift the delay line one sample (delay_[k] = x[n-k]) and MAC.
  for (std::size_t k = delay_.size() - 1; k > 0; --k) {
    delay_[k] = delay_[k - 1];
  }
  delay_[0] = x;
  double acc = 0.0;
  for (std::size_t k = 0; k < taps_.size(); ++k) {
    acc += taps_[k] * delay_[k];
  }
  return acc;
}

std::vector<double> Fir1DStream::process_block(const std::vector<double>& x) {
  std::vector<double> out;
  out.reserve(x.size());
  for (double sample : x) out.push_back(process_sample(sample));
  return out;
}

namespace {

inline std::int64_t wrap_to_acc_bits(std::int64_t acc, int acc_bits) {
  if (acc_bits >= 64) return acc;
  const int shift = 64 - acc_bits;
  return (acc << shift) >> shift;  // truncate + arithmetic sign extend
}

inline std::int64_t bias_round_shift(std::int64_t acc, int frac_bits) {
  const std::int64_t low = acc & ((std::int64_t{1} << frac_bits) - 1);
  const std::int64_t carry =
      (low + (std::int64_t{1} << (frac_bits - 1))) >> frac_bits;
  return (acc >> frac_bits) + carry;
}

}  // namespace

void fir1d_fixed_rows(const std::uint8_t* x, std::int64_t batch,
                      std::int64_t width, const std::int64_t* taps_fixed,
                      std::int64_t num_taps, const QFormatSpec& spec,
                      std::uint8_t* out) {
  const std::int64_t center = num_taps / 2;
  for (std::int64_t row = 0; row < batch; ++row) {
    const std::uint8_t* xr = x + row * width;
    std::uint8_t* yr = out + row * width;
    for (std::int64_t n = 0; n < width; ++n) {
      std::int64_t acc = 0;
      for (std::int64_t k = 0; k < num_taps; ++k) {
        const std::int64_t idx = n - k + center;
        if (idx >= 0 && idx < width) {
          acc += taps_fixed[k] * static_cast<std::int64_t>(xr[idx]);
        }
      }
      acc = wrap_to_acc_bits(acc, spec.acc_bits);
      const std::int64_t final_val = bias_round_shift(acc, spec.frac_bits);
      yr[n] = static_cast<std::uint8_t>(
          std::clamp<std::int64_t>(final_val, 0, 255));
    }
  }
}

CompareResult bit_compare_u8(const std::uint8_t* a, const std::uint8_t* b,
                             std::int64_t n) {
  CompareResult result;
  result.num_samples = n;
  double sum_abs = 0.0;
  double sum_sq = 0.0;
  for (std::int64_t i = 0; i < n; ++i) {
    const std::int64_t diff =
        static_cast<std::int64_t>(a[i]) - static_cast<std::int64_t>(b[i]);
    if (diff != 0) ++result.num_mismatches;
    const std::int64_t abs_diff = diff < 0 ? -diff : diff;
    result.max_abs_err = std::max(result.max_abs_err, abs_diff);
    sum_abs += static_cast<double>(abs_diff);
    sum_sq += static_cast<double>(diff) * static_cast<double>(diff);
  }
  if (n > 0) {
    result.mae = sum_abs / static_cast<double>(n);
    result.rmse = std::sqrt(sum_sq / static_cast<double>(n));
  }
  return result;
}

}  // namespace wft
