"""MXU band-matrix FIR kernel: construction + bit-equality tests.

The matrix-construction logic is pure numpy (tested exhaustively here);
kernel-vs-golden bit-equality runs in interpret mode on CPU and compiled
on TPU via bench.py / WFT_TEST_PLATFORM=tpu.
"""

import numpy as np
import pytest

from warmup_fir_filter_tpu.kernels.fir_mxu import (
    LANE,
    build_band_matrices,
    fir1d_fixed_rows_mxu,
    signed_base256_digits,
)
from warmup_fir_filter_tpu.models.filters import FILTER_BANKS
from warmup_fir_filter_tpu.models.golden import fir1d_fixed_golden_rows
from warmup_fir_filter_tpu.ops.qformat import QFormat


class TestSignedDigits:
    @pytest.mark.parametrize(
        "values", [[0], [1], [-1], [127], [-128], [128], [255], [256],
                   [32767], [-32768], [6656], [2**31 - 1], [-(2**31)]]
    )
    def test_roundtrip(self, values):
        digits = signed_base256_digits(np.array(values))
        assert digits.dtype == np.int8
        recon = sum(
            (256**b) * digits[b].astype(object) for b in range(len(digits))
        )
        assert list(recon) == values

    def test_random_roundtrip(self, rng):
        values = rng.integers(-(2**31), 2**31, size=100)
        digits = signed_base256_digits(values)
        recon = np.zeros(100, dtype=np.int64)
        for b in range(digits.shape[0]):
            recon += (256**b) * digits[b].astype(np.int64)
        np.testing.assert_array_equal(recon, values)


class TestBandMatrices:
    def test_band_reconstructs_convolution(self, rng):
        # [X_t | X_{t+1}[:, :L-1]] @ stacked must equal the direct conv
        # (the stacked operand is trimmed to K = 128 + L - 1).
        num_taps = 5
        h_fixed = rng.integers(-30000, 30000, size=num_taps)
        stacked, exps = build_band_matrices(h_fixed)
        x_ext = rng.integers(-128, 128, size=(4, 2 * LANE)).astype(np.int64)
        windows = x_ext[:, : LANE + num_taps - 1]
        full = sum(
            (windows @ stacked[p].astype(np.int64)) << e
            for p, e in enumerate(exps)
        )
        direct = np.zeros((4, LANE), np.int64)
        for i in range(LANE):
            for k in range(num_taps):
                direct[:, i] += h_fixed[k] * x_ext[:, i + num_taps - 1 - k]
        np.testing.assert_array_equal(full, direct)

    def test_zero_digit_planes_dropped(self):
        # Q4.12 bank coefficients are multiples of 256 → one kept plane
        # at bit shift 8 (pow2-factored), trimmed to K = 128 + (L - 1).
        qf = QFormat()
        h_fixed = qf.quantize_coeffs(FILTER_BANKS[5]["sharpen"])
        stacked, exps = build_band_matrices(h_fixed)
        assert exps == (8,)
        assert stacked.shape == (1, LANE + 4, LANE)

    def test_pow2_factoring_collapses_planes(self):
        from warmup_fir_filter_tpu.kernels.fir_mxu import factor_pow2

        # Values all multiples of 16 but > 127: raw digits would need
        # two planes; pow2 factoring collapses them to one.
        h_fixed = np.array([96, 384, 576, 384, 96], np.int64)
        reduced, s = factor_pow2(h_fixed)
        assert s == 5
        np.testing.assert_array_equal(reduced << s, h_fixed)
        stacked, exps = build_band_matrices(h_fixed)
        assert len(exps) == 1
        assert exps == (5,)

    def test_too_many_taps_rejected(self):
        with pytest.raises(ValueError, match="supports up to"):
            build_band_matrices(np.ones(200, np.int64))


@pytest.mark.parametrize("tap", [3, 5])
def test_mxu_bit_exact_filter_bank(rng, tap):
    h = np.asarray(FILTER_BANKS[tap]["sharpen"])
    x = rng.integers(0, 256, size=(6, 300), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_mxu(x, h, block_rows=8, col_tiles=2)),
        fir1d_fixed_golden_rows(x, h),
    )


def test_mxu_bit_exact_wraparound(rng):
    qf = QFormat(acc_bits=16)
    h = np.array([qf.max_coeff_real, -8.0, 7.5])
    x = rng.integers(0, 256, size=(4, 256), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_mxu(x, h, qf, block_rows=8, col_tiles=2)),
        fir1d_fixed_golden_rows(x, h, qf),
    )


def test_mxu_wide_filter_63tap(rng):
    h = rng.uniform(-0.5, 0.5, 63)
    x = rng.integers(0, 256, size=(3, 400), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_mxu(x, h, block_rows=8, col_tiles=2)),
        fir1d_fixed_golden_rows(x, h),
    )


@pytest.mark.parametrize("num_taps", [129, 200, 257])
def test_mxu_tri_tile_tap_range(rng, num_taps):
    # The tri-tile band supports up to 257 taps (one full lane tile of
    # halo each side); the two-tile formulation stopped at 129.
    h = rng.uniform(-0.05, 0.05, num_taps)
    x = rng.integers(0, 256, size=(2, 700), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_mxu(x, h, block_rows=8, col_tiles=2)),
        fir1d_fixed_golden_rows(x, h),
    )


def test_mxu_tap_limit_rejected():
    with pytest.raises(ValueError, match="supports up to"):
        fir1d_fixed_rows_mxu(
            np.zeros((2, 300), np.uint8), np.full(258, 1e-3)
        )


@pytest.mark.parametrize(
    "shape",
    [
        (9, 512),     # lane-aligned width (zero-copy), batch ∤ block_rows
        (4, 4096),    # multi-tile aligned width
        (5, 129),     # just past one lane tile (pad path)
        (1, 16),      # tiny
        (3, 128 * 7), # prime lane count → col_tiles=7 divisor rule
    ],
)
def test_mxu_alignment_classes(rng, shape):
    h = np.asarray(FILTER_BANKS[5]["edge"])
    x = rng.integers(0, 256, size=shape, dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_mxu(x, h)),
        fir1d_fixed_golden_rows(x, h),
    )
