"""Bit-exact parity against the upstream reference implementation.

When the read-only reference checkout is available (dev containers only),
run its actual Python models side-by-side with ours on randomized inputs
and assert bit-identical outputs.  Skipped elsewhere — the contract tests
in test_fir1d_ideal.py / test_fir1d_fixed.py carry the same guarantees via
hand-computed oracles.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE_ROOT = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE_ROOT / "fir_1d/model/python/fir_1d_ref.py").exists(),
    reason="upstream reference checkout not available",
)


@pytest.fixture(scope="module")
def reference_models():
    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        from fir_1d.model.python.fir_1d_ref import fir_1d_ideal as ref_ideal
        from fir_1d.model.python.fir_1d_fixed_ref import (
            fir_1d_fixed_golden as ref_fixed,
        )
    finally:
        sys.path.remove(str(REFERENCE_ROOT))
    return ref_ideal, ref_fixed


@pytest.mark.parametrize("tap", [3, 5])
def test_ideal_bitwise_parity(reference_models, rng, tap):
    from warmup_fir_filter_tpu.models import fir_1d_ideal
    from warmup_fir_filter_tpu.models.filters import FILTER_BANKS

    ref_ideal, _ = reference_models
    x = rng.integers(0, 256, size=73).tolist()
    for h in FILTER_BANKS[tap].values():
        ours = np.asarray(fir_1d_ideal(x, h))
        theirs = np.asarray(ref_ideal(x, h))
        np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize(
    "frac_bits,acc_bits,coeff_bits",
    [(12, 32, 16), (12, 16, 16), (7, 24, 8), (12, 32, 32), (4, 12, 16)],
)
def test_fixed_bitwise_parity(reference_models, rng, frac_bits, acc_bits,
                              coeff_bits):
    from warmup_fir_filter_tpu.models import fir_1d_fixed_golden

    _, ref_fixed = reference_models
    x = rng.integers(0, 256, size=61).tolist()
    scale = 1 << frac_bits
    hi = ((1 << (coeff_bits - 1)) - 1) / scale
    h = [min(0.5, hi), -min(0.25, hi), min(hi, 7.9)]
    ours = fir_1d_fixed_golden(x, h, frac_bits=frac_bits, acc_bits=acc_bits,
                               coeff_bits=coeff_bits)
    theirs = ref_fixed(x, h, frac_bits=frac_bits, acc_bits=acc_bits,
                       coeff_bits=coeff_bits)
    np.testing.assert_array_equal(ours, theirs)


def test_fixed_float_input_parity(reference_models, rng):
    from warmup_fir_filter_tpu.models import fir_1d_fixed_golden

    _, ref_fixed = reference_models
    x = (rng.uniform(-5.0, 260.0, size=50)).tolist()
    h = [0.25, 0.5, 0.25]
    np.testing.assert_array_equal(
        fir_1d_fixed_golden(x, h), ref_fixed(x, h)
    )
