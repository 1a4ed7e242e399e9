"""2-D MXU kernel: plan construction + bit-equality (interpret on CPU)."""

import numpy as np
import pytest

from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
    build_band_matrices_2d,
    fir2d_fixed_mxu,
)
from warmup_fir_filter_tpu.ops.fir2d import (
    FILTER_BANK_2D,
    fir2d_fixed_golden,
)
from warmup_fir_filter_tpu.ops.qformat import QFormat


class TestPlan2D:
    def test_zero_tap_rows_skipped(self):
        h = np.zeros((3, 3))
        h[1, 1] = 1.0
        h_fixed = QFormat().quantize_coeffs(h).astype(np.int64)
        stacked, plan, k_width = build_band_matrices_2d(h_fixed)
        # Only the middle tap-row is nonzero; its quantized value 4096
        # needs two digit planes at most.
        row_shifts = {entry[0] for entry in plan}
        assert row_shifts == {1}  # taps_r - 1 - kr = 3 - 1 - 1

    def test_all_zero_filter(self):
        stacked, plan, k_width = build_band_matrices_2d(
            np.zeros((3, 3), np.int64)
        )
        assert len(plan) == 1
        assert not stacked.any()


@pytest.mark.parametrize("name", ["box3", "gauss5", "laplacian"])
def test_mxu2d_bit_exact_bank(rng, name):
    h = FILTER_BANK_2D[name]
    x = rng.integers(0, 256, size=(20, 40), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir2d_fixed_mxu(x, h, block_rows=8, col_tiles=1)),
        fir2d_fixed_golden(x, h),
    )


def test_mxu2d_even_and_tall_kernels(rng):
    x = rng.integers(0, 256, size=(17, 33), dtype=np.uint8)
    for shape in ((2, 4), (9, 3)):
        h = rng.uniform(-0.5, 0.5, shape)
        np.testing.assert_array_equal(
            np.asarray(fir2d_fixed_mxu(x, h, block_rows=8, col_tiles=1)),
            fir2d_fixed_golden(x, h),
        )


def test_mxu2d_wraparound(rng):
    qf = QFormat(acc_bits=18)
    h = rng.uniform(-4, 4, (3, 3))
    x = rng.integers(0, 256, size=(12, 24), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir2d_fixed_mxu(x, h, qf, block_rows=8, col_tiles=1)),
        fir2d_fixed_golden(x, h, qf),
    )
