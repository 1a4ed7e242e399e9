"""Randomized cross-implementation sweep over QFormats and tap counts.

Breadth ring: every (coeff_bits, frac_bits, acc_bits, L) cell runs the
same random vectors through the numpy golden, the jnp int32 path, and
the MXU kernel (interpret on CPU), asserting three-way bit-equality.
"""

import numpy as np
import pytest

from warmup_fir_filter_tpu.kernels.fir_mxu import fir1d_fixed_rows_mxu
from warmup_fir_filter_tpu.models.golden import fir1d_fixed_golden_rows
from warmup_fir_filter_tpu.ops.fir1d import fir1d_fixed_rows_jnp
from warmup_fir_filter_tpu.ops.qformat import QFormat

SWEEP = [
    # (coeff_bits, frac_bits, acc_bits, num_taps)
    (8, 4, 32, 3),
    (8, 7, 16, 7),
    (16, 12, 32, 5),
    (16, 12, 20, 5),
    (16, 8, 24, 11),
    (16, 15, 31, 4),
    (32, 24, 32, 3),
    (32, 12, 28, 6),
    (16, 1, 8, 2),
]


@pytest.mark.parametrize("coeff_bits,frac_bits,acc_bits,num_taps", SWEEP)
def test_three_way_bit_equality(rng, coeff_bits, frac_bits, acc_bits,
                                num_taps):
    qf = QFormat(coeff_bits=coeff_bits, frac_bits=frac_bits,
                 acc_bits=acc_bits)
    span = min(qf.max_coeff_real, 8.0)
    h = rng.uniform(-span, span, size=num_taps)
    h = np.clip(h, max(qf.min_coeff_real, -8.0), span)
    x = rng.integers(0, 256, size=(3, 150), dtype=np.uint8)

    golden = fir1d_fixed_golden_rows(x, h, qf)
    jnp_out = np.asarray(fir1d_fixed_rows_jnp(x, h, qf))
    mxu_out = np.asarray(
        fir1d_fixed_rows_mxu(x, h, qf, block_rows=8, col_tiles=2)
    )
    np.testing.assert_array_equal(jnp_out, golden)
    np.testing.assert_array_equal(mxu_out, golden)
