"""2-D MXU kernel: plan construction + bit-equality (interpret on CPU)."""

import numpy as np
import pytest

from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
    LANE,
    build_tile_band_planes_2d,
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
        _, a_cur, _, plan, _, _ = build_tile_band_planes_2d(h_fixed)
        # Only the middle tap-row is nonzero; its quantized value
        # 4096 = 1 << 12 pow2-factors into ONE digit plane.
        assert {rs for rs, _, _ in plan} == {1}  # taps_r - 1 - kr
        assert len(plan) == 1
        assert plan[0][1] == 12  # accumulation exponent

    def test_dense_rows_go_to_mxu_planes(self):
        h = np.array([[0.25, 0.5, 0.25], [0.0, 0.0, 0.0],
                      [0.25, 0.5, 0.25]])
        h_fixed = QFormat().quantize_coeffs(h).astype(np.int64)
        (a_prev, a_cur, a_next, plan,
         left, center) = build_tile_band_planes_2d(h_fixed)
        assert {rs for rs, _, _ in plan} == {0, 2}  # zero row skipped
        assert a_cur.shape == (len(plan), LANE, LANE)
        assert a_prev.shape == (len(plan), max(left, 1), LANE)
        assert a_next.shape == (len(plan), max(center, 1), LANE)

    def test_all_zero_filter(self):
        (a_prev, a_cur, a_next, plan,
         _, _) = build_tile_band_planes_2d(np.zeros((3, 3), np.int64))
        assert plan == ()
        assert not a_cur.any()

    def test_all_zero_filter_bit_exact(self, rng):
        # No planes at all: the kernel still produces the golden output
        # (pure bias/rounding path).
        x = rng.integers(0, 256, size=(12, 20), dtype=np.uint8)
        h = np.zeros((3, 3))
        np.testing.assert_array_equal(
            np.asarray(fir2d_fixed_mxu(x, h, block_rows=8)),
            fir2d_fixed_golden(x, h),
        )

    def test_cross_filter_bit_exact(self, rng):
        # Cross-shaped kernel: single-nonzero digit planes (one per
        # tap-row after pow2 factoring).
        x = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
        h = np.zeros((3, 3))
        h[0, 1], h[1, 1], h[2, 1] = 0.25, -0.5, 0.25
        np.testing.assert_array_equal(
            np.asarray(fir2d_fixed_mxu(x, h, block_rows=8)),
            fir2d_fixed_golden(x, h),
        )


@pytest.mark.parametrize("layout", ["overlap", "plain"])
@pytest.mark.parametrize("name", ["box3", "gauss5", "laplacian"])
def test_mxu2d_bit_exact_bank(rng, name, layout):
    h = FILTER_BANK_2D[name]
    x = rng.integers(0, 256, size=(20, 40), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir2d_fixed_mxu(x, h, block_rows=8, layout=layout)),
        fir2d_fixed_golden(x, h),
    )


@pytest.mark.parametrize("layout", ["overlap", "plain"])
def test_mxu2d_even_and_tall_kernels(rng, layout):
    x = rng.integers(0, 256, size=(17, 33), dtype=np.uint8)
    for shape in ((2, 4), (9, 3), (1, 2)):
        h = rng.uniform(-0.5, 0.5, shape)
        np.testing.assert_array_equal(
            np.asarray(fir2d_fixed_mxu(x, h, block_rows=8, layout=layout)),
            fir2d_fixed_golden(x, h),
        )


@pytest.mark.parametrize("layout", ["overlap", "plain"])
def test_mxu2d_multi_block_rows(rng, layout):
    # More than one row block: exercises the head/tail halo operands
    # across real block boundaries (not just the clamped edges).
    h = FILTER_BANK_2D["gauss5"]
    x = rng.integers(0, 256, size=(70, 40), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir2d_fixed_mxu(x, h, block_rows=16, layout=layout)),
        fir2d_fixed_golden(x, h),
    )


@pytest.mark.parametrize("layout", ["overlap", "plain"])
def test_mxu2d_wraparound(rng, layout):
    qf = QFormat(acc_bits=18)
    h = rng.uniform(-4, 4, (3, 3))
    x = rng.integers(0, 256, size=(12, 24), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir2d_fixed_mxu(x, h, qf, block_rows=8, layout=layout)),
        fir2d_fixed_golden(x, h, qf),
    )


def test_mxu2d_wide_image_many_tiles(rng):
    # Several overlapped tiles with duplicated boundary columns in the
    # middle of the image: the neighbor-patch assembly must hand exact
    # values across every tile seam.
    h = FILTER_BANK_2D["sharpen5"]
    x = rng.integers(0, 256, size=(12, 700), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir2d_fixed_mxu(x, h, block_rows=8, layout="overlap")),
        fir2d_fixed_golden(x, h),
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


class TestOverlapFrameAPI:
    """Streaming overlapped-frame surface: fixed point of the kernel."""

    def test_frame_matches_cropped_and_duplicates_consistent(self, rng):
        from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
            crop_frame_overlap,
            fir2d_fixed_frame_overlap,
            pad_frame_overlap,
        )

        h = FILTER_BANK_2D["sharpen5"]
        x = rng.integers(0, 256, size=(30, 300), dtype=np.uint8)
        x_ext, (t0, h_img, w_img, br) = pad_frame_overlap(x, 5, 5,
                                                          block_rows=16)
        core = (t0, h_img, w_img)
        out = np.asarray(
            fir2d_fixed_frame_overlap(x_ext, h, core=core, block_rows=br)
        )
        np.testing.assert_array_equal(
            crop_frame_overlap(out, 5, core), fir2d_fixed_golden(x, h)
        )
        # The duplicated boundary columns must be written consistently
        # (fixed-point property): re-embedding the cropped image yields
        # exactly the output frame.
        re_ext, _ = pad_frame_overlap(crop_frame_overlap(out, 5, core),
                                      5, 5, block_rows=16)
        np.testing.assert_array_equal(out, np.asarray(re_ext))

    def test_chained_applies_match_repeated_golden(self, rng):
        from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
            crop_frame_overlap,
            fir2d_fixed_frame_overlap,
            pad_frame_overlap,
        )

        h = FILTER_BANK_2D["box3"]
        x = rng.integers(0, 256, size=(20, 260), dtype=np.uint8)
        x_ext, (t0, h_img, w_img, br) = pad_frame_overlap(x, 3, 3,
                                                          block_rows=8)
        core = (t0, h_img, w_img)
        frame = fir2d_fixed_frame_overlap(x_ext, h, core=core, block_rows=br)
        frame = fir2d_fixed_frame_overlap(frame, h, core=core, block_rows=br)
        golden = fir2d_fixed_golden(fir2d_fixed_golden(x, h), h)
        np.testing.assert_array_equal(
            crop_frame_overlap(np.asarray(frame), 3, core), golden
        )

    def test_scratch_alias_matches_unaliased(self, rng):
        import jax.numpy as jnp

        from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
            fir2d_fixed_frame_overlap,
            pad_frame_overlap,
        )

        h = FILTER_BANK_2D["gauss5"]
        x = rng.integers(0, 256, size=(26, 150), dtype=np.uint8)
        x_ext, (t0, h_img, w_img, br) = pad_frame_overlap(x, 5, 5,
                                                          block_rows=16)
        core = (t0, h_img, w_img)
        plain = np.asarray(
            fir2d_fixed_frame_overlap(x_ext, h, core=core, block_rows=br)
        )
        aliased = np.asarray(
            fir2d_fixed_frame_overlap(x_ext, h, core=core, block_rows=br,
                                      scratch=jnp.zeros_like(x_ext))
        )
        np.testing.assert_array_equal(plain, aliased)

    def test_too_wide_column_taps_rejected(self, rng):
        from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
            OFRAME_MAX_OVERLAP,
            fir2d_fixed_frame_overlap,
            pad_frame_overlap,
        )

        h = rng.uniform(-0.5, 0.5, (3, OFRAME_MAX_OVERLAP + 2))
        with pytest.raises(ValueError, match="overlapped frame"):
            pad_frame_overlap(
                rng.integers(0, 256, size=(8, 8), dtype=np.uint8),
                3, OFRAME_MAX_OVERLAP + 2,
            )
        x_ext, (t0, h_img, w_img, br) = pad_frame_overlap(
            rng.integers(0, 256, size=(8, 8), dtype=np.uint8), 3, 3
        )
        with pytest.raises(ValueError, match="overlapped frame"):
            fir2d_fixed_frame_overlap(x_ext, h, core=(t0, h_img, w_img),
                                      block_rows=br)


def test_fir2d_auto_dispatch_bit_exact(rng):
    from warmup_fir_filter_tpu.kernels.dispatch import fir2d_fixed_auto

    h = FILTER_BANK_2D["gauss5"]
    x = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(fir2d_fixed_auto(x, h)), fir2d_fixed_golden(x, h)
    )


class TestReducedPlaneFormulations:
    """r5 (VERDICT r4 task 3): the two reduced-digit-plane 2-D paths.

    - bf16 per-tap-row kernel: PROVABLY bit-exact when
      ``bf16_2d_exact`` holds (coefficients fit the 8-bit bf16
      mantissa, worst-case accumulator < 2²⁴, no wrap) — true for
      sharpen5 and gauss5; SNR-level otherwise.  Measured SLOWER than
      the int8 digit kernel on v5e (bf16 MXU passes cost ~2× int8) —
      kept as the proven-exact float formulation, never auto-dispatched.
    - digit_mode="top": per-row top-digit rounding (one plane per row);
      exact only for rows already fitting one digit.
    """

    def _roundtrip(self, fn, img, h, **kw):
        from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
            crop_frame_overlap,
            pad_frame_overlap,
        )

        tr, tc = np.asarray(h).shape
        x_ext, (t0, hi, wi, br) = pad_frame_overlap(img, tr, tc)
        out = fn(x_ext, h, core=(t0, hi, wi), block_rows=br, **kw)
        return crop_frame_overlap(np.asarray(out), tc, (t0, hi, wi))

    @pytest.mark.parametrize("name", ["sharpen5", "gauss5"])
    def test_bf16_bit_exact_when_predicate_holds(self, rng, name):
        from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
            bf16_2d_exact,
            fir2d_frame_overlap_bf16,
        )
        from warmup_fir_filter_tpu.ops.qformat import QFormat

        h = np.asarray(FILTER_BANK_2D[name])
        qf = QFormat()
        assert bf16_2d_exact(qf.quantize_coeffs(h).astype(np.int64), qf)
        img = rng.integers(0, 256, size=(64, 200), dtype=np.uint8)
        got = self._roundtrip(fir2d_frame_overlap_bf16, img, h)
        np.testing.assert_array_equal(got, fir2d_fixed_golden(img, h))

    def test_bf16_predicate_rejects_wide_mantissa(self):
        from warmup_fir_filter_tpu.kernels.fir2d_mxu import bf16_2d_exact
        from warmup_fir_filter_tpu.ops.qformat import QFormat

        qf = QFormat()
        h_fixed = QFormat().quantize_coeffs(
            np.asarray(FILTER_BANK_2D["box3"])).astype(np.int64)
        assert not bf16_2d_exact(h_fixed, qf)  # 455 needs 9 mantissa bits

    def test_bf16_snr_gated_otherwise(self, rng):
        from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
            fir2d_frame_overlap_bf16,
        )
        from warmup_fir_filter_tpu.ops.fftfilt import snr_db

        h = np.asarray(FILTER_BANK_2D["box3"])
        img = rng.integers(0, 256, size=(48, 160), dtype=np.uint8)
        got = self._roundtrip(fir2d_frame_overlap_bf16, img, h)
        golden = fir2d_fixed_golden(img, h).astype(np.float64)
        assert float(snr_db(golden, got.astype(np.float64))) > 40.0

    def test_top_digit_exact_for_single_digit_rows(self, rng):
        from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
            fir2d_fixed_frame_overlap,
        )

        h = np.asarray(FILTER_BANK_2D["gauss5"])  # 1 digit/row already
        img = rng.integers(0, 256, size=(40, 150), dtype=np.uint8)
        got = self._roundtrip(fir2d_fixed_frame_overlap, img, h,
                              digit_mode="top")
        np.testing.assert_array_equal(got, fir2d_fixed_golden(img, h))

    def test_unknown_digit_mode_rejected(self, rng):
        from warmup_fir_filter_tpu.kernels.fir2d_mxu import (
            fir2d_fixed_frame_overlap,
            pad_frame_overlap,
        )

        img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
        x_ext, (t0, hi, wi, br) = pad_frame_overlap(img, 5, 5)
        with pytest.raises(ValueError, match="digit_mode"):
            fir2d_fixed_frame_overlap(
                x_ext, FILTER_BANK_2D["gauss5"], core=(t0, hi, wi),
                block_rows=br, digit_mode="bottom")
