"""jnp (TPU sim/model path) vs numpy golden oracle cross-checks.

The fixed-point jnp path must be bit-identical to the golden for every
acc_bits ≤ 32 (SURVEY.md §7.3 item 1); the float jnp path must be within
f32 accumulation tolerance of the float64 golden.
"""

import numpy as np
import pytest

from warmup_fir_filter_tpu.models.filters import FILTER_BANKS
from warmup_fir_filter_tpu.models.golden import (
    fir1d_fixed_golden_rows,
    fir1d_ideal_golden_rows,
)
from warmup_fir_filter_tpu.ops.fir1d import (
    fir1d_fixed_rows_jnp,
    fir1d_ideal_rows_jnp,
)
from warmup_fir_filter_tpu.ops.qformat import QFormat


def _random_rows(rng, batch, n):
    return rng.integers(0, 256, size=(batch, n), dtype=np.uint8)


@pytest.mark.parametrize("tap", [3, 5])
@pytest.mark.parametrize("name", ["moving_avg", "simple_lp", "edge", "sharpen"])
def test_fixed_jnp_bit_exact_filter_bank(rng, tap, name):
    h = np.asarray(FILTER_BANKS[tap][name])
    x = _random_rows(rng, 4, 97)
    golden = fir1d_fixed_golden_rows(x, h)
    jnp_out = np.asarray(fir1d_fixed_rows_jnp(x, h))
    np.testing.assert_array_equal(jnp_out, golden)


@pytest.mark.parametrize("acc_bits", [8, 12, 16, 20, 24, 31, 32])
def test_fixed_jnp_bit_exact_wraparound(rng, acc_bits):
    # Max-magnitude coefficients to force accumulator wraparound.
    qf = QFormat(acc_bits=acc_bits)
    h = np.array([qf.max_coeff_real, -8.0, qf.max_coeff_real])
    x = _random_rows(rng, 3, 64)
    golden = fir1d_fixed_golden_rows(x, h, qf)
    jnp_out = np.asarray(fir1d_fixed_rows_jnp(x, h, qf))
    np.testing.assert_array_equal(jnp_out, golden)


@pytest.mark.parametrize("coeff_bits", [8, 16, 32])
def test_fixed_jnp_bit_exact_coeff_widths(rng, coeff_bits):
    qf = QFormat(coeff_bits=coeff_bits, frac_bits=6)
    h = np.array([0.5, -0.25, 0.75, 0.125, -0.5])
    x = _random_rows(rng, 2, 130)
    golden = fir1d_fixed_golden_rows(x, h, qf)
    jnp_out = np.asarray(fir1d_fixed_rows_jnp(x, h, qf))
    np.testing.assert_array_equal(jnp_out, golden)


def test_fixed_jnp_rejects_wide_acc(rng):
    with pytest.raises(ValueError, match="int32 TPU sim path"):
        fir1d_fixed_rows_jnp(_random_rows(rng, 1, 8), [0.5],
                             QFormat(acc_bits=48))


@pytest.mark.parametrize("tap", [3, 5])
def test_ideal_jnp_close_to_golden_f64(rng, tap):
    for name, h in FILTER_BANKS[tap].items():
        h = np.asarray(h)
        x = _random_rows(rng, 4, 257)
        golden = fir1d_ideal_golden_rows(x, h)
        jnp_out = np.asarray(fir1d_ideal_rows_jnp(x, h), dtype=np.float64)
        # f32 accumulation over ≤5 taps of |h·x| ≤ 2040: abs tol ~1e-2.
        np.testing.assert_allclose(jnp_out, golden, atol=1e-2, rtol=1e-5)


def test_single_sample_row():
    h = np.array([0.25, 0.5, 0.25])
    x = np.array([[200]], dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir1d_fixed_rows_jnp(x, h)),
        fir1d_fixed_golden_rows(x, h),
    )
