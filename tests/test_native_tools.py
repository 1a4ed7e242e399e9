"""Native C++ tools vs Python golden cross-checks (via ctypes).

Skipped when the native library is not built
(``cmake --preset release && cmake --build --preset release``).
"""

import numpy as np
import pytest

from warmup_fir_filter_tpu import native
from warmup_fir_filter_tpu.models.filters import FILTER_BANKS
from warmup_fir_filter_tpu.models.golden import fir1d_fixed_golden_rows
from warmup_fir_filter_tpu.ops.qformat import QFormat

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native tools library not built"
)


class TestNativeFixedGolden:
    @pytest.mark.parametrize("tap", [3, 5])
    def test_bit_exact_vs_python_golden(self, rng, tap):
        h = np.asarray(FILTER_BANKS[tap]["sharpen"])
        x = rng.integers(0, 256, size=(5, 137), dtype=np.uint8)
        np.testing.assert_array_equal(
            native.fir1d_fixed_rows_native(x, h),
            fir1d_fixed_golden_rows(x, h),
        )

    @pytest.mark.parametrize("acc_bits", [12, 16, 24, 32])
    def test_wraparound_formats(self, rng, acc_bits):
        qf = QFormat(acc_bits=acc_bits)
        h = np.array([7.5, -8.0, qf.max_coeff_real])
        x = rng.integers(0, 256, size=(3, 90), dtype=np.uint8)
        np.testing.assert_array_equal(
            native.fir1d_fixed_rows_native(x, h, qf),
            fir1d_fixed_golden_rows(x, h, qf),
        )


class TestNativeStream:
    def test_causal_delay_line(self):
        # Causal streaming: y[n] = Σ h[k]·x[n-k] (fir_1d_ref.cpp:16-33
        # semantics, reproduced without the reference's code).
        stream = native.NativeFirStream([0.5, 0.25])
        out = stream.process([8.0, 4.0, 2.0])
        np.testing.assert_allclose(out, [4.0, 4.0, 2.0])
        stream.reset()
        np.testing.assert_allclose(stream.process([8.0]), [4.0])
        stream.close()

    def test_matches_python_streaming_up_to_center_delay(self, rng):
        # Causal C++ output == same-mode output delayed by center.
        from warmup_fir_filter_tpu.models.golden import (
            fir1d_ideal_golden_rows,
        )

        h = np.asarray(FILTER_BANKS[5]["simple_lp"])
        x = rng.integers(0, 256, size=60).astype(np.float64)
        stream = native.NativeFirStream(h)
        causal = stream.process(x)
        same_mode = fir1d_ideal_golden_rows(
            x[None, :].astype(np.uint8), h
        )[0]
        center = 2
        np.testing.assert_allclose(causal[center:], same_mode[: 60 - center])
        stream.close()


class TestBitCompare:
    def test_identical_buffers(self, rng):
        a = rng.integers(0, 256, size=1000, dtype=np.uint8)
        result = native.bit_compare_u8(a, a.copy())
        assert result["bit_exact"]
        assert result["num_mismatches"] == 0
        assert result["rmse"] == 0.0

    def test_known_differences(self):
        a = np.array([0, 100, 200], np.uint8)
        b = np.array([0, 90, 255], np.uint8)
        result = native.bit_compare_u8(a, b)
        assert result["num_mismatches"] == 2
        assert result["max_abs_err"] == 55
        assert result["mae"] == pytest.approx((10 + 55) / 3)

    def test_size_mismatch_rejected(self):
        with pytest.raises(ValueError, match="Size mismatch"):
            native.bit_compare_u8(np.zeros(3, np.uint8),
                                  np.zeros(4, np.uint8))


class TestNativeFFT:
    def test_matches_numpy_fft(self, rng):
        n = 256
        re = rng.normal(size=n)
        im = rng.normal(size=n)
        out_re, out_im = native.fft_radix2_native(re, im)
        expected = np.fft.fft(re + 1j * im)
        np.testing.assert_allclose(out_re, expected.real, atol=1e-9)
        np.testing.assert_allclose(out_im, expected.imag, atol=1e-9)

    def test_inverse_roundtrip(self, rng):
        n = 128
        re = rng.normal(size=n)
        im = rng.normal(size=n)
        fr, fi = native.fft_radix2_native(re, im)
        br, bi = native.fft_radix2_native(fr, fi, inverse=True)
        np.testing.assert_allclose(br, re, atol=1e-10)
        np.testing.assert_allclose(bi, im, atol=1e-10)

    def test_non_pow2_rejected(self):
        with pytest.raises(ValueError, match="power of two"):
            native.fft_radix2_native(np.zeros(12), np.zeros(12))
