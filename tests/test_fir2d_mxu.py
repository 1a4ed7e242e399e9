"""2-D MXU kernel: plan construction + bit-equality (interpret on CPU)."""

import numpy as np
import pytest

from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
    LANE,
    build_band_matrices_2d,
    fir2d_fixed_frame,
    fir2d_fixed_mxu,
    pad_frame,
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
        np.asarray(fir2d_fixed_mxu(x, h, block_rows=8)),
        fir2d_fixed_golden(x, h),
    )


def test_mxu2d_even_and_tall_kernels(rng):
    x = rng.integers(0, 256, size=(17, 33), dtype=np.uint8)
    for shape in ((2, 4), (9, 3)):
        h = rng.uniform(-0.5, 0.5, shape)
        np.testing.assert_array_equal(
            np.asarray(fir2d_fixed_mxu(x, h, block_rows=8)),
            fir2d_fixed_golden(x, h),
        )


def test_mxu2d_multi_block_rows(rng):
    # More than one row block: exercises the head/tail halo operands
    # across real block boundaries (not just the clamped edges).
    h = FILTER_BANK_2D["gauss5"]
    x = rng.integers(0, 256, size=(70, 40), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir2d_fixed_mxu(x, h, block_rows=16)),
        fir2d_fixed_golden(x, h),
    )


def test_mxu2d_wraparound(rng):
    qf = QFormat(acc_bits=18)
    h = rng.uniform(-4, 4, (3, 3))
    x = rng.integers(0, 256, size=(12, 24), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir2d_fixed_mxu(x, h, qf, block_rows=8)),
        fir2d_fixed_golden(x, h, qf),
    )


class TestFrameAPI:
    """Streaming padded-frame surface: fixed-point of the kernel."""

    def test_frame_matches_cropped_and_pad_rezeroed(self, rng):
        h = FILTER_BANK_2D["gauss5"]
        x = rng.integers(0, 256, size=(30, 50), dtype=np.uint8)
        x_ext, (t0, h_img, w_img, br) = pad_frame(x, 5, block_rows=16)
        out = np.asarray(
            fir2d_fixed_frame(x_ext, h, core=(t0, h_img, w_img),
                              block_rows=br)
        )
        np.testing.assert_array_equal(
            out[t0 : t0 + h_img, LANE : LANE + w_img],
            fir2d_fixed_golden(x, h),
        )
        # Everything outside the core is re-zeroed: the frame layout is
        # a fixed point of the kernel.
        mask = np.ones_like(out, bool)
        mask[t0 : t0 + h_img, LANE : LANE + w_img] = False
        assert not out[mask].any()

    def test_chained_applies_match_repeated_golden(self, rng):
        h = FILTER_BANK_2D["box3"]
        x = rng.integers(0, 256, size=(20, 24), dtype=np.uint8)
        x_ext, (t0, h_img, w_img, br) = pad_frame(x, 3, block_rows=8)
        core = (t0, h_img, w_img)
        frame = fir2d_fixed_frame(x_ext, h, core=core, block_rows=br)
        frame = fir2d_fixed_frame(frame, h, core=core, block_rows=br)
        golden = fir2d_fixed_golden(fir2d_fixed_golden(x, h), h)
        np.testing.assert_array_equal(
            np.asarray(frame)[t0 : t0 + h_img, LANE : LANE + w_img],
            golden,
        )

    def test_scratch_alias_matches_unaliased(self, rng):
        import jax.numpy as jnp

        h = FILTER_BANK_2D["gauss5"]
        x = rng.integers(0, 256, size=(26, 30), dtype=np.uint8)
        x_ext, (t0, h_img, w_img, br) = pad_frame(x, 5, block_rows=16)
        core = (t0, h_img, w_img)
        plain = np.asarray(
            fir2d_fixed_frame(x_ext, h, core=core, block_rows=br)
        )
        scratch = jnp.zeros_like(x_ext)
        aliased = np.asarray(
            fir2d_fixed_frame(x_ext, h, core=core, block_rows=br,
                              scratch=scratch)
        )
        np.testing.assert_array_equal(plain, aliased)

    def test_bad_frame_geometry_rejected(self, rng):
        h = FILTER_BANK_2D["gauss5"]
        x_ext, (t0, h_img, w_img, br) = pad_frame(
            rng.integers(0, 256, size=(20, 20), dtype=np.uint8), 5,
            block_rows=8,
        )
        with pytest.raises(ValueError, match="incompatible"):
            fir2d_fixed_frame(x_ext[:-1], h, core=(t0, h_img, w_img),
                              block_rows=br)


def test_fir2d_auto_dispatch_bit_exact(rng):
    from warmup_fir_filter_tpu.kernels.dispatch import fir2d_fixed_auto

    h = FILTER_BANK_2D["gauss5"]
    x = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir2d_fixed_auto(x, h)), fir2d_fixed_golden(x, h)
    )
