"""Pallas FIR kernel vs golden oracle bit-equality (interpret mode on CPU).

The kernel-vs-interpreter-golden ring the reference lacks (SURVEY.md §4.3);
on real TPU hardware the same checks run compiled (see bench.py).
"""

import numpy as np
import pytest

from warmup_fir_filter_tpu.kernels.fir_pallas import fir1d_fixed_rows_pallas
from warmup_fir_filter_tpu.models.filters import FILTER_BANKS
from warmup_fir_filter_tpu.models.golden import fir1d_fixed_golden_rows
from warmup_fir_filter_tpu.ops.qformat import QFormat


def _random_rows(rng, batch, n):
    return rng.integers(0, 256, size=(batch, n), dtype=np.uint8)


@pytest.mark.parametrize("tap", [3, 5])
@pytest.mark.parametrize("name", ["moving_avg", "edge", "sharpen"])
def test_pallas_bit_exact_filter_bank(rng, tap, name):
    h = np.asarray(FILTER_BANKS[tap][name])
    x = _random_rows(rng, 5, 200)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_pallas(x, h, block_rows=8)),
        fir1d_fixed_golden_rows(x, h),
    )


@pytest.mark.parametrize("acc_bits", [12, 16, 24, 32])
def test_pallas_bit_exact_wraparound(rng, acc_bits):
    qf = QFormat(acc_bits=acc_bits)
    h = np.array([qf.max_coeff_real, -8.0, 7.5, qf.max_coeff_real, -3.25])
    x = _random_rows(rng, 4, 160)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_pallas(x, h, qf, block_rows=8)),
        fir1d_fixed_golden_rows(x, h, qf),
    )


def test_pallas_unaligned_shapes(rng):
    # Batch not a multiple of block_rows, width not a multiple of 128.
    h = np.asarray(FILTER_BANKS[5]["sharpen"])
    x = _random_rows(rng, 3, 77)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_pallas(x, h, block_rows=8)),
        fir1d_fixed_golden_rows(x, h),
    )


def test_pallas_single_tap_identity(rng):
    x = _random_rows(rng, 2, 64)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_pallas(x, [1.0], block_rows=8)), x
    )


def test_pallas_rejects_wide_acc(rng):
    with pytest.raises(ValueError, match="int32 TPU sim path"):
        fir1d_fixed_rows_pallas(_random_rows(rng, 1, 8), [0.5],
                                QFormat(acc_bits=40))
