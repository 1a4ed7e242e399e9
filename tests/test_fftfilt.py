"""FFT overlap-save tests: alignment exactness + SNR contracts."""

import numpy as np
import pytest

from warmup_fir_filter_tpu.models.golden import (
    fir1d_fixed_golden_rows,
    fir1d_ideal_golden_rows,
)
from warmup_fir_filter_tpu.ops.fftfilt import (
    fir_overlap_save,
    fir_overlap_save_quantized,
    pick_nfft,
    snr_db,
)


def test_matches_ideal_small(rng):
    h = rng.uniform(-0.5, 0.5, 7)
    x = rng.integers(0, 256, size=(3, 500), dtype=np.uint8)
    ideal = fir1d_ideal_golden_rows(x, h)
    fft_out = np.asarray(fir_overlap_save(x, h), np.float64)
    np.testing.assert_allclose(fft_out, ideal, atol=2e-2)
    assert snr_db(ideal, fft_out) > 80.0


def test_63tap_snr_contract(rng):
    """BASELINE config 4 numeric contract: 63-tap FFT path vs direct."""
    h = rng.uniform(-0.1, 0.1, 63)
    x = rng.integers(0, 256, size=(4, 10_000), dtype=np.uint8)
    ideal = fir1d_ideal_golden_rows(x, h)
    fft_out = np.asarray(fir_overlap_save(x, h), np.float64)
    assert snr_db(ideal, fft_out) > 70.0


def test_block_boundary_alignment(rng):
    # Output must be continuous across overlap-save block boundaries:
    # use a short nfft so many boundaries occur, and an impulse filter so
    # misalignment is a hard shift error, not noise.
    h = np.zeros(9)
    h[4] = 1.0  # identity at center
    x = rng.integers(0, 256, size=(2, 777), dtype=np.uint8)
    out = np.asarray(fir_overlap_save(x, h, nfft=32))
    np.testing.assert_allclose(out, x.astype(np.float32), atol=1e-3)


def test_even_tap_alignment(rng):
    h = np.array([1.0, 0.0])  # L=2, center=1 → y[n] = x[n+1]
    x = rng.integers(0, 256, size=(1, 100), dtype=np.uint8)
    out = np.asarray(fir_overlap_save(x, h, nfft=16))
    expected = fir1d_ideal_golden_rows(x, h)
    np.testing.assert_allclose(out, expected, atol=1e-3)


def test_quantized_fft_vs_fixed_sim(rng):
    # The u8 FFT output must track the bit-exact fixed sim within the
    # reference-style SNR bound (quantization-limited, not FFT-limited).
    h = rng.uniform(-0.05, 0.05, 63)
    x = rng.integers(0, 256, size=(2, 8_000), dtype=np.uint8)
    fixed = fir1d_fixed_golden_rows(x, h)
    fft_u8 = np.asarray(fir_overlap_save_quantized(x, h))
    # Difference may only be occasional ±1 rounding flips.
    diff = fft_u8.astype(np.int32) - fixed.astype(np.int32)
    assert np.abs(diff).max() <= 1
    assert float(np.mean(diff != 0)) < 0.02


def test_nfft_too_small_rejected():
    with pytest.raises(ValueError, match="nfft"):
        fir_overlap_save(np.zeros((1, 10), np.uint8), np.ones(63), nfft=32)


def test_pick_nfft():
    assert pick_nfft(5) == 256
    assert pick_nfft(63) == 512
