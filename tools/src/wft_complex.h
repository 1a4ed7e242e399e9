// Complex value type + twiddle/FFT utilities.
//
// Native equivalent of the reference's MyComplex library
// (lib/mycomplex.h:10-41): phase constructor (unit phasor / FFT twiddle),
// magnitude, arithmetic operators — here completed into the radix-2 FFT
// that MyComplex only scaffolded, and with correct mixed scalar-complex
// subtraction (the reference's friend operator-(double, MyComplex) left
// the imaginary part unnegated, mycomplex.cpp:39-41).
#pragma once

#include <cmath>
#include <cstddef>
#include <vector>

namespace wft {

struct Complex {
  double re = 0.0;
  double im = 0.0;

  Complex() = default;
  Complex(double real, double imag) : re(real), im(imag) {}

  // Unit phasor e^{i·theta} — the FFT twiddle constructor.
  static Complex from_phase(double theta) {
    return Complex(std::cos(theta), std::sin(theta));
  }

  double magnitude() const { return std::hypot(re, im); }

  Complex operator+(const Complex& o) const {
    return Complex(re + o.re, im + o.im);
  }
  Complex operator-(const Complex& o) const {
    return Complex(re - o.re, im - o.im);
  }
  Complex operator*(const Complex& o) const {
    return Complex(re * o.re - im * o.im, re * o.im + im * o.re);
  }
  Complex operator*(double s) const { return Complex(re * s, im * s); }
  // Division guards a zero denominator by returning zero, matching the
  // reference's policy (mycomplex.cpp:25-34).
  Complex operator/(const Complex& o) const {
    const double denom = o.re * o.re + o.im * o.im;
    if (denom == 0.0) return Complex(0.0, 0.0);
    return Complex((re * o.re + im * o.im) / denom,
                   (im * o.re - re * o.im) / denom);
  }
};

inline Complex operator-(double s, const Complex& a) {
  return Complex(s - a.re, -a.im);  // correct sign on the imaginary part
}

// Precompute the N/2 forward twiddles W_N^k = e^{-2πik/N}.
std::vector<Complex> twiddle_table(std::size_t n);

// In-place iterative radix-2 DIT FFT (n must be a power of two);
// inverse=true applies conjugate twiddles and 1/n scaling.
void fft_radix2(std::vector<Complex>& data, bool inverse);

}  // namespace wft
