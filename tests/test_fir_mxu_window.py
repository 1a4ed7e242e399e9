"""Windowed-band MXU FIR kernel: any-L construction + bit-equality.

Generalizes the tri-tile kernel beyond its 257-tap band limit
(VERDICT r2 item 6): one matmul per (lane tile × digit plane) against a
contiguous L+127-sample window, per-plane row trimming, zero-pad edges
folded into a host-built per-tile bias table, and jnp-level overlap-save
segmentation for over-wide rows.  Bit-equality runs in interpret mode on
CPU; compiled equality + throughput on TPU via bench_configs/roofline.
"""

import numpy as np
import pytest

from warmup_fir_filter_tpu.kernels.fir_mxu import (
    LANE,
    MAX_TAPS_WINDOWED,
    build_window_band_planes,
    fir1d_fixed_rows_mxu_window,
)
from warmup_fir_filter_tpu.models.filters import FILTER_BANKS
from warmup_fir_filter_tpu.models.golden import fir1d_fixed_golden_rows
from warmup_fir_filter_tpu.ops.qformat import QFormat
from warmup_fir_filter_tpu.ops.resample import design_lowpass


class TestWindowBandPlanes:
    def test_window_reconstructs_convolution(self, rng):
        # Σ_b (X_window @ A_b) << e_b over the trimmed entries must equal
        # the direct same-mode convolution for one interior output tile.
        num_taps = 37
        h_fixed = rng.integers(-30000, 30000, size=num_taps)
        bands, entries = build_window_band_planes(h_fixed)
        center = num_taps // 2
        left = num_taps - 1 - center
        n_ext = LANE + num_taps - 1
        x_ext = rng.integers(-128, 128, size=(4, n_ext)).astype(np.int64)
        # x_ext[j] is input position (tile_start - left + j).
        full = np.zeros((4, LANE), np.int64)
        for exp, j0, rows, off in entries:
            a = bands[off : off + rows].astype(np.int64)
            full += (x_ext[:, j0 : j0 + rows] @ a) << exp
        direct = np.zeros((4, LANE), np.int64)
        for i in range(LANE):
            for k in range(num_taps):
                # input position i - k + center relative to tile start
                # = index left + i - k + center in x_ext coordinates.
                direct[:, i] += h_fixed[k] * x_ext[:, left + i - k + center]
        np.testing.assert_array_equal(full, direct)

    def test_per_plane_trimming(self):
        # A long lowpass concentrates |h_fixed| ≥ 128 near the center:
        # the high-byte plane's band must be much narrower than the
        # low-byte plane's full L+127 rows.
        h = design_lowpass(1001, 0.25)
        h_fixed = QFormat().quantize_coeffs(h).astype(np.int64)
        bands, entries = build_window_band_planes(h_fixed)
        assert len(entries) == 2
        rows = {exp: r for exp, _, r, _ in entries}
        low_exp, high_exp = sorted(rows)
        # Low plane: near-dense (tail taps that quantize to zero trim it
        # slightly below L+127).  High plane: main lobe only.
        assert 700 < rows[low_exp] <= 1001 + 127
        assert rows[high_exp] < 400
        assert rows[high_exp] < rows[low_exp] // 2

    def test_tap_limit_rejected(self):
        with pytest.raises(ValueError, match="supports up to"):
            build_window_band_planes(
                np.ones(MAX_TAPS_WINDOWED + 1, np.int64))


@pytest.mark.parametrize("num_taps", [258, 511, 1001])
def test_window_bit_exact_beyond_tri_tile(rng, num_taps):
    h = design_lowpass(num_taps, 0.2)
    x = rng.integers(0, 256, size=(3, 1500), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_mxu_window(x, h, block_rows=8)),
        fir1d_fixed_golden_rows(x, h),
    )


@pytest.mark.parametrize("tap", [3, 5])
def test_window_bit_exact_filter_bank(rng, tap):
    # The windowed kernel covers small L too (tri-tile replacement
    # candidate): must match golden on the reference filter banks.
    for name, h in FILTER_BANKS[tap].items():
        x = rng.integers(0, 256, size=(4, 300), dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(fir1d_fixed_rows_mxu_window(x, np.asarray(h),
                                                   block_rows=8)),
            fir1d_fixed_golden_rows(x, np.asarray(h)),
            err_msg=f"filter {name}",
        )


def test_window_bit_exact_wraparound(rng):
    # Large coefficients + narrow accumulator force the wrap path.
    qf = QFormat(acc_bits=16)
    h = np.array([qf.max_coeff_real, -8.0, 7.5] * 90)  # 270 taps
    x = rng.integers(0, 256, size=(2, 640), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_mxu_window(x, h, qf, block_rows=8)),
        fir1d_fixed_golden_rows(x, h, qf),
    )


def test_window_row_shorter_than_filter(rng):
    # n < L: every tile is a both-sides edge tile; the bias table must
    # carry the pad contributions of both window ends.
    h = design_lowpass(258, 0.3)
    x = rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_mxu_window(x, h, block_rows=8)),
        fir1d_fixed_golden_rows(x, h),
    )


def test_window_segmented_wide_rows(rng):
    # Force tiny segmentation windows (4 lane tiles = 512 samples) so a
    # 2000-sample row takes the overlap-save path with interior margins.
    h = design_lowpass(63, 0.25)
    x = rng.integers(0, 256, size=(3, 2000), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_mxu_window(
            x, h, block_rows=8, max_row_lanes=4)),
        fir1d_fixed_golden_rows(x, h),
    )


def test_window_segmented_long_filter(rng):
    # Segmentation + a beyond-tri-tile filter together.
    h = design_lowpass(301, 0.1)
    x = rng.integers(0, 256, size=(2, 3000), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_mxu_window(
            x, h, block_rows=8, max_row_lanes=8)),
        fir1d_fixed_golden_rows(x, h),
    )


def test_dispatch_routes_long_filters(rng):
    from warmup_fir_filter_tpu.kernels.dispatch import fir1d_fixed_rows_auto

    h = design_lowpass(511, 0.2)
    x = rng.integers(0, 256, size=(2, 800), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_auto(x, h)),
        fir1d_fixed_golden_rows(x, h),
    )
