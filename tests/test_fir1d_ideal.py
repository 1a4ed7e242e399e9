"""Ideal float model contract tests.

Re-derives the reference's ideal-model test contract
(``fir_1d/sim/tests/test_1d_ideal.py``, 13 tests — SURVEY.md §4.1) against
our parity API and golden oracle.
"""

import numpy as np
import pytest

from warmup_fir_filter_tpu.models import fir_1d_ideal
from warmup_fir_filter_tpu.models.golden import fir1d_ideal_golden_rows


class TestIdealConvolution:
    def test_hand_computed_3tap(self):
        # Hand oracle: same-mode [10,20,30,40] * [.25,.5,.25]
        # y[0] = .5*10 + .25*20 = 10 (left zero pad)
        # y[3] = .25*30 + .5*40 = 27.5 (right zero pad)
        y = fir_1d_ideal([10, 20, 30, 40], [0.25, 0.5, 0.25])
        assert y == [10.0, 20.0, 30.0, 27.5]

    def test_same_length_contract(self):
        for n in (1, 2, 5, 17):
            y = fir_1d_ideal(list(range(n)), [0.25, 0.5, 0.25])
            assert len(y) == n

    def test_identity_filter(self):
        y = fir_1d_ideal([5, 10, 15], [1.0])
        assert y == [5.0, 10.0, 15.0]

    def test_even_tap_center(self):
        # L=2, center = 1: y[n] = h[0]*x[n+1] + h[1]*x[n]
        y = fir_1d_ideal([1, 2, 3, 4], [1.0, 0.0])
        assert y == [2.0, 3.0, 4.0, 0.0]


class TestIdealPreprocessing:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            (0.49, 0.0),   # round-half-up boundary: floor(0.99) = 0
            (0.5, 1.0),    # floor(1.0) = 1
            (1.49, 1.0),
            (1.5, 2.0),
            (-3.0, 0.0),   # clamp low
            (300.0, 255.0),  # clamp high
            (-0.6, 0.0),   # floor(-0.1) = -1 then clamp to 0
        ],
    )
    def test_round_half_up_then_clamp(self, raw, expected):
        y = fir_1d_ideal([raw], [1.0])
        assert y == [expected]

    def test_output_not_clamped(self):
        # Ideal spec: output is pass-through, exposing dynamic range
        # (fir_1d_ideal_spec_v1.md:43-45).
        y = fir_1d_ideal([255, 255], [5.0])
        assert y == [1275.0, 1275.0]

    def test_output_can_go_negative(self):
        y = fir_1d_ideal([0, 255], [-1.0, 0.0, 1.0])
        # y[0] = -x[1] = -255 ; y[1] = -x[2 (pad)] + x[0] = 0
        assert y == [-255.0, 0.0]


class TestIdealValidation:
    @pytest.mark.parametrize("bad", [float("nan"), float("inf"), float("-inf")])
    def test_nonfinite_x_rejected(self, bad):
        with pytest.raises(ValueError, match="x must be finite"):
            fir_1d_ideal([1.0, bad, 3.0], [1.0])

    @pytest.mark.parametrize("bad", [float("nan"), float("inf"), float("-inf")])
    def test_nonfinite_h_rejected(self, bad):
        with pytest.raises(ValueError, match="must be finite"):
            fir_1d_ideal([1, 2, 3], [0.5, bad])

    def test_empty_h_rejected(self):
        with pytest.raises(ValueError, match="must not be empty"):
            fir_1d_ideal([1, 2, 3], [])

    @pytest.mark.parametrize("mag", [8.0001, 100.0, -8.5])
    def test_h_magnitude_limit(self, mag):
        with pytest.raises(ValueError, match=r"\|h\| must be <= 8.0"):
            fir_1d_ideal([1, 2, 3], [mag])

    @pytest.mark.parametrize("mag", [8.0, -8.0])
    def test_h_magnitude_boundary_accepted(self, mag):
        y = fir_1d_ideal([1, 2, 3], [mag])
        assert y == [1 * mag, 2 * mag, 3 * mag]


class TestGoldenRowsMatchScalarContract:
    def test_rows_equal_per_row_calls(self, synthetic_rows):
        h = [0.25, 0.5, 0.25]
        batched = fir1d_ideal_golden_rows(synthetic_rows, np.array(h))
        for i, row in enumerate(synthetic_rows):
            np.testing.assert_array_equal(
                batched[i], np.asarray(fir_1d_ideal(row.tolist(), h))
            )

    def test_float64_dtype(self, synthetic_rows):
        out = fir1d_ideal_golden_rows(synthetic_rows, np.array([1.0 / 3.0] * 3))
        assert out.dtype == np.float64
        assert out.shape == synthetic_rows.shape
