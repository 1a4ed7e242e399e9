"""Hand-written Pallas TPU kernels (the native fast path).

TPU-native successor of the reference's C++ model layer (SURVEY.md §2.2):
where the reference pairs a Python truth model with a C++ performance
model, this package pairs the numpy golden oracle with Pallas kernels that
are bit-checked against it.
"""

from warmup_fir_filter_tpu.kernels.fir_pallas import fir1d_fixed_rows_pallas
from warmup_fir_filter_tpu.kernels.fir_mxu import fir1d_fixed_rows_mxu
from warmup_fir_filter_tpu.kernels.fir_float_mxu import fir1d_ideal_rows_mxu
from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
    crop_frame_overlap,
    fir2d_fixed_frame,
    fir2d_fixed_frame_overlap,
    fir2d_fixed_mxu,
    pad_frame,
    pad_frame_overlap,
)
from warmup_fir_filter_tpu.kernels.fft_pallas import (
    fft_rows_pallas,
    fir_overlap_save_pallas,
    fir_overlap_save_quantized_pallas,
)
from warmup_fir_filter_tpu.kernels.dispatch import (
    fir1d_fixed_rows_auto,
    fir2d_fixed_auto,
)

__all__ = [
    "fir1d_fixed_rows_pallas",
    "fir1d_fixed_rows_mxu",
    "fir1d_ideal_rows_mxu",
    "fir2d_fixed_mxu",
    "fir2d_fixed_frame",
    "fir2d_fixed_frame_overlap",
    "crop_frame_overlap",
    "pad_frame",
    "pad_frame_overlap",
    "fft_rows_pallas",
    "fir_overlap_save_pallas",
    "fir_overlap_save_quantized_pallas",
    "fir1d_fixed_rows_auto",
    "fir2d_fixed_auto",
]
