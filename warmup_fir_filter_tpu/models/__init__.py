"""Model layer: trusted numpy golden oracle + reference-parity API."""

from warmup_fir_filter_tpu.models.golden import (
    fir1d_ideal_golden_rows,
    fir1d_fixed_golden_rows,
)
from warmup_fir_filter_tpu.models.reference_api import (
    fir_1d_ideal,
    fir_1d_fixed_golden,
)

__all__ = [
    "fir1d_ideal_golden_rows",
    "fir1d_fixed_golden_rows",
    "fir_1d_ideal",
    "fir_1d_fixed_golden",
]
