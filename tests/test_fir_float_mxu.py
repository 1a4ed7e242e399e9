"""Float MXU FIR kernel: accuracy vs the f64 golden model (interpret)."""

import numpy as np
import pytest

from warmup_fir_filter_tpu.kernels.fir_float_mxu import (
    build_tile_band_planes_f32,
    fir1d_ideal_rows_mxu,
)
from warmup_fir_filter_tpu.models.filters import FILTER_BANKS
from warmup_fir_filter_tpu.models.golden import fir1d_ideal_golden_rows
from warmup_fir_filter_tpu.ops.resample import design_lowpass


class TestFloatBandPlanes:
    def test_planes_reconstruct_convolution(self, rng):
        num_taps = 7
        h = rng.uniform(-1, 1, num_taps)
        a_prev, a_cur, a_next = build_tile_band_planes_f32(h)
        center, left = num_taps // 2, num_taps - 1 - num_taps // 2
        x = rng.uniform(-1, 1, (3, 3 * 128))
        got = (
            x[:, 128 - left : 128] @ a_prev
            + x[:, 128:256] @ a_cur
            + x[:, 256 : 256 + center] @ a_next
        )
        expected = np.zeros((3, 128))
        for i in range(128):
            for k in range(num_taps):
                expected[:, i] += h[k] * x[:, 128 + i + center - k]
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("tap", [3, 5])
def test_matches_golden_filter_bank(rng, tap):
    for name, h in FILTERS_SUBSET(tap):
        x = rng.integers(0, 256, size=(4, 300), dtype=np.uint8)
        got = np.asarray(fir1d_ideal_rows_mxu(x, h, block_rows=8))
        expected = fir1d_ideal_golden_rows(x, np.asarray(h))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-3,
                                   err_msg=name)


def FILTERS_SUBSET(tap):
    return list(FILTER_BANKS[tap].items())


def test_matches_golden_63tap_float_input(rng):
    h = design_lowpass(63, 0.25)
    x = rng.uniform(-3, 3, size=(2, 512)).astype(np.float32)
    got = np.asarray(fir1d_ideal_rows_mxu(x, h, block_rows=8))
    expected = fir1d_ideal_golden_rows(x, h)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("precision", ["bf16x3", "highest"])
def test_precision_modes_snr(rng, precision):
    """bf16x3 must reach >=100 dB SNR vs the f64 golden on u8-scale
    data (measured 114 dB on hardware); highest is f32-exact-ish."""
    from warmup_fir_filter_tpu.ops.fftfilt import snr_db

    h = design_lowpass(63, 0.25)
    x = rng.uniform(0, 255, size=(4, 640)).astype(np.float32)
    got = np.asarray(
        fir1d_ideal_rows_mxu(x, h, precision=precision, block_rows=8)
    )
    golden = fir1d_ideal_golden_rows(x, h)
    snr = snr_db(golden, got.astype(np.float64))
    assert snr > (100.0 if precision == "bf16x3" else 120.0), snr


def test_unknown_precision_rejected(rng):
    with pytest.raises(ValueError, match="precision"):
        fir1d_ideal_rows_mxu(np.zeros((2, 128), np.uint8), [0.5, 0.5],
                             precision="fast")


def test_ragged_width_and_batch(rng):
    h = np.asarray(FILTER_BANKS[5]["sharpen"])
    x = rng.integers(0, 256, size=(5, 137), dtype=np.uint8)
    got = np.asarray(fir1d_ideal_rows_mxu(x, h, block_rows=8))
    np.testing.assert_allclose(
        got, fir1d_ideal_golden_rows(x, h), rtol=1e-5, atol=1e-3
    )


def test_wide_rows_fall_back(rng):
    # > MAX_FULLROW_LANES lanes: must still produce the model contract
    # (via the grid-native wide kernel).
    h = np.asarray(FILTER_BANKS[3]["simple_lp"])
    x = rng.integers(0, 256, size=(1, 257 * 128), dtype=np.uint8)
    got = np.asarray(fir1d_ideal_rows_mxu(x, h))
    expected = fir1d_ideal_golden_rows(x, h)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-2)


@pytest.mark.parametrize("precision", ["bf16x3", "highest"])
def test_wide_rows_ragged_multirow(rng, precision):
    # Wide grid kernel edge cases: n not a multiple of the lane tile or
    # the superblock, several rows crossing a row-block boundary, and an
    # even-tap filter (asymmetric halo).  Checks the stream head/tail
    # zero-pad and the ragged-tail masking all at once.
    h = rng.standard_normal(10)
    n = 257 * 128 + 37  # ragged: n % 128 != 0, n % seg != 0
    x = rng.standard_normal((5, n)).astype(np.float32)
    got = np.asarray(
        fir1d_ideal_rows_mxu(x, h, precision=precision, block_rows=8)
    )
    expected = fir1d_ideal_golden_rows(x, h)
    tol = dict(rtol=1e-5, atol=1e-5) if precision == "highest" else \
        dict(rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got, expected, **tol)


def test_chain_mxu_channelizer_matches_jnp(rng):
    from warmup_fir_filter_tpu.models.chain import ChainConfig, chain_forward

    t = np.arange(20_000)
    re = 0.5 * np.cos(2 * np.pi * 0.01 * t)[None, :].astype(np.float32)
    im = 0.5 * np.sin(2 * np.pi * 0.01 * t)[None, :].astype(np.float32)
    out_mxu = np.asarray(
        chain_forward(re, im, ChainConfig(channelizer_backend="mxu"))
    )
    out_jnp = np.asarray(
        chain_forward(re, im, ChainConfig(channelizer_backend="jnp"))
    )
    np.testing.assert_allclose(out_mxu, out_jnp, rtol=1e-3, atol=1e-4)

@pytest.mark.parametrize("precision", ["bf16x3", "highest"])
def test_chunked_wide_kernel_matches_jnp(rng, precision):
    """The capped-unroll (fori_loop) wide kernel — r4 ablation knob,
    kept non-default after measuring slower than the unrolled form
    (docs/roofline.md "capped-unroll ablation") — must stay correct:
    multi-superblock + multi-chunk + ragged tail in one shape."""
    from warmup_fir_filter_tpu.ops.fir1d import fir1d_ideal_rows_jnp

    h = design_lowpass(63, 0.25)
    # Wide rows (> MAX_FULLROW_LANES tiles) so the wide-kernel path —
    # not the fullrow kernel — is actually exercised.
    n = 128 * 128 * 2 + 37  # 2 superblocks of 128 tiles + ragged tail
    x = (rng.standard_normal((3, n)) * 50).astype(np.float32)
    ref = np.asarray(fir1d_ideal_rows_jnp(x, h))
    got = np.asarray(fir1d_ideal_rows_mxu(
        x, h, precision=precision, seg_tiles=128, unroll=32))
    tol = 2e-6 if precision == "highest" else 3e-5
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert got.shape == ref.shape
    assert err < tol, err


def test_chunked_wide_kernel_rejects_bad_unroll(rng):
    h = design_lowpass(5, 0.25)
    x = rng.standard_normal((2, 300 * 128)).astype(np.float32)
    with pytest.raises(ValueError, match="must divide"):
        fir1d_ideal_rows_mxu(x, h, seg_tiles=8, unroll=3)
