"""Pallas matmul-FFT kernel tests: np.fft agreement + fused filter.

Runs in interpret mode on the CPU mesh (conftest); the same code path
compiles on TPU (exercised by bench_configs.py).
"""

import numpy as np
import pytest

from warmup_fir_filter_tpu.kernels.fft_pallas import (
    factor_nfft,
    fft_rows_pallas,
    fir_overlap_save_pallas,
    fir_overlap_save_quantized_pallas,
)
from warmup_fir_filter_tpu.models.golden import (
    fir1d_fixed_golden_rows,
    fir1d_ideal_golden_rows,
)
from warmup_fir_filter_tpu.ops.fftfilt import fir_overlap_save, snr_db


def _cplx(re, im):
    return np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64)


class TestFactor:
    def test_splits(self):
        assert factor_nfft(128) == (1, 128)
        assert factor_nfft(256) == (2, 128)
        assert factor_nfft(512) == (4, 128)
        assert factor_nfft(16384) == (128, 128)

    @pytest.mark.parametrize("bad", [0, 1, 96, 3, 500, 32768])
    def test_rejects(self, bad):
        with pytest.raises(ValueError):
            factor_nfft(bad)


class TestForward:
    @pytest.mark.parametrize("nfft", [128, 256, 512, 2048])
    def test_complex_matches_numpy(self, rng, nfft):
        x = rng.normal(size=(5, nfft)) + 1j * rng.normal(size=(5, nfft))
        re, im = fft_rows_pallas(x.real, x.imag)
        want = np.fft.fft(x, axis=-1)
        scale = np.abs(want).max()
        np.testing.assert_allclose(
            _cplx(re, im), want, atol=2e-4 * scale, rtol=0
        )

    @pytest.mark.parametrize("nfft", [128, 512])
    def test_real_input(self, rng, nfft):
        x = rng.normal(size=(3, nfft))
        re, im = fft_rows_pallas(x)
        want = np.fft.fft(x, axis=-1)
        scale = np.abs(want).max()
        np.testing.assert_allclose(
            _cplx(re, im), want, atol=2e-4 * scale, rtol=0
        )

    def test_single_row_and_padding(self, rng):
        # batch smaller than a row block exercises the pad/trim path
        x = rng.normal(size=(1, 256))
        re, im = fft_rows_pallas(x)
        want = np.fft.fft(x, axis=-1)
        np.testing.assert_allclose(
            _cplx(re, im), want, atol=1e-3, rtol=0
        )


class TestInverse:
    @pytest.mark.parametrize("nfft", [128, 512])
    def test_roundtrip(self, rng, nfft):
        x = rng.normal(size=(4, nfft)) + 1j * rng.normal(size=(4, nfft))
        fr, fi = fft_rows_pallas(x.real, x.imag)
        br, bi = fft_rows_pallas(fr, fi, inverse=True)
        np.testing.assert_allclose(
            _cplx(br, bi), x, atol=5e-4 * np.abs(x).max(), rtol=0
        )

    def test_inverse_matches_numpy(self, rng):
        spec = rng.normal(size=(2, 256)) + 1j * rng.normal(size=(2, 256))
        br, bi = fft_rows_pallas(spec.real, spec.imag, inverse=True)
        want = np.fft.ifft(spec, axis=-1)
        np.testing.assert_allclose(
            _cplx(br, bi), want, atol=1e-5, rtol=0
        )

    def test_inverse_requires_imag(self):
        with pytest.raises(ValueError, match="inverse"):
            fft_rows_pallas(np.zeros((1, 128)), inverse=True)


class TestFusedOverlapSave:
    def test_matches_jnp_path(self, rng):
        h = rng.uniform(-0.1, 0.1, 63)
        x = rng.integers(0, 256, size=(3, 5_000), dtype=np.uint8)
        want = np.asarray(fir_overlap_save(x, h), np.float64)
        got = np.asarray(fir_overlap_save_pallas(x, h), np.float64)
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=0)
        assert snr_db(want, got) > 80.0

    def test_matches_ideal(self, rng):
        h = rng.uniform(-0.5, 0.5, 7)
        x = rng.integers(0, 256, size=(2, 700), dtype=np.uint8)
        ideal = fir1d_ideal_golden_rows(x, h)
        got = np.asarray(fir_overlap_save_pallas(x, h), np.float64)
        assert snr_db(ideal, got) > 80.0

    def test_block_boundary_alignment(self, rng):
        # Identity-at-center filter makes any misalignment a hard error.
        h = np.zeros(9)
        h[4] = 1.0
        x = rng.integers(0, 256, size=(2, 700), dtype=np.uint8)
        out = np.asarray(fir_overlap_save_pallas(x, h, nfft=128))
        np.testing.assert_allclose(out, x.astype(np.float32), atol=1e-2)

    def test_even_tap_alignment(self, rng):
        h = np.array([1.0, 0.0])  # L=2, center=1 → y[n] = x[n+1]
        x = rng.integers(0, 256, size=(1, 300), dtype=np.uint8)
        out = np.asarray(fir_overlap_save_pallas(x, h, nfft=128))
        expected = fir1d_ideal_golden_rows(x, h)
        np.testing.assert_allclose(out, expected, atol=1e-2)

    def test_quantized_vs_fixed_sim(self, rng):
        h = rng.uniform(-0.05, 0.05, 63)
        x = rng.integers(0, 256, size=(2, 4_000), dtype=np.uint8)
        fixed = fir1d_fixed_golden_rows(x, h)
        fft_u8 = np.asarray(fir_overlap_save_quantized_pallas(x, h))
        diff = fft_u8.astype(np.int32) - fixed.astype(np.int32)
        assert np.abs(diff).max() <= 1
        assert float(np.mean(diff != 0)) < 0.02

    def test_nfft_too_small_rejected(self):
        with pytest.raises(ValueError, match="nfft"):
            fir_overlap_save_pallas(
                np.zeros((1, 10), np.uint8), np.ones(63), nfft=32
            )

    def test_nfft_over_kernel_cap_rejected(self):
        # pick_nfft(num_taps > 2048) exceeds the 16384-point 4-step cap;
        # the error must fire at dispatch, not inside factor_nfft.
        with pytest.raises(ValueError, match="16384-point cap"):
            fir_overlap_save_pallas(
                np.zeros((1, 8), np.uint8), np.ones(3000)
            )
        with pytest.raises(ValueError, match="16384-point cap"):
            fir_overlap_save_quantized_pallas(
                np.zeros((1, 8), np.uint8), np.full(3000, 1e-4)
            )
        with pytest.raises(ValueError, match="16384-point cap"):
            fir_overlap_save_pallas(
                np.zeros((1, 8), np.uint8), np.ones(63), nfft=32768
            )


class TestStreamOverlapSave:
    """r5 zero-copy stream kernel: in-VMEM framing, direct valid output.

    The kernel reads the raw (C, T) stream with aligned halo tiles and
    emits same-mode outputs with no XLA framing/unframing pass; the
    spectral shift d places the valid half-window on aligned chunks
    (see kernels/fft_pallas.py, stream-kernel section).
    """

    CASES = [
        # (C, T, L, off) — spans edges, offsets, ragged widths, L range
        (3, 2000, 63, 0),
        (2, 1111, 63, 31),      # the sharded-path offset contract
        (1, 700, 5, 0),
        (4, 4096, 129, 64),
        (2, 900, 257, 128),     # L at the kernel cap, d = 0
        (2, 513, 63, 62),
        (3, 300, 63, 0),        # single partial program
        (2, 257, 1, 0),         # identity filter, m_shift = 0
    ]

    @pytest.mark.parametrize("channels,time,taps,off", CASES)
    def test_matches_reference_overlap_save(self, rng, channels, time,
                                            taps, off):
        from warmup_fir_filter_tpu.kernels.fft_pallas import (
            fir_overlap_save_stream,
            stream_kernel_supported,
        )
        from warmup_fir_filter_tpu.ops.resample import design_lowpass

        assert stream_kernel_supported(taps, off)
        x = rng.standard_normal((channels, time + off)).astype(np.float32)
        h = design_lowpass(taps, 0.2) if taps > 1 else np.array([1.0])
        ref = np.asarray(fir_overlap_save(x, h), np.float64)[:, off:]
        got = np.asarray(
            fir_overlap_save_stream(x, h, off=off, out_len=time),
            np.float64)
        assert float(snr_db(ref[:, :time], got)) > 90.0

    def test_u8_fused_output(self, rng):
        from warmup_fir_filter_tpu.kernels.fft_pallas import (
            fir_overlap_save_stream,
        )
        from warmup_fir_filter_tpu.ops.resample import design_lowpass

        h = design_lowpass(63, 0.25)
        x = rng.integers(0, 256, size=(2, 3000), dtype=np.uint8)
        got = np.asarray(fir_overlap_save_stream(x, h, out_u8=True))
        reff = np.asarray(
            fir_overlap_save(x.astype(np.float32), h), np.float64)
        ref = np.clip(np.floor(reff + 0.5), 0, 255).astype(np.uint8)
        assert got.dtype == np.uint8
        assert float((got == ref).mean()) > 0.999  # float-rounding ties

    def test_unsupported_rejected(self):
        from warmup_fir_filter_tpu.kernels.fft_pallas import (
            fir_overlap_save_stream,
            stream_kernel_supported,
        )

        assert not stream_kernel_supported(259)   # past the L cap
        assert not stream_kernel_supported(63, off=300)  # off+center > 256
        with pytest.raises(ValueError, match="stream kernel"):
            fir_overlap_save_stream(np.zeros((1, 512), np.float32),
                                    np.ones(259))


def test_stream_geometry_invariants():
    """The single-source alignment helper (r5): class invariants that
    every stream-kernel consumer relies on."""
    from warmup_fir_filter_tpu.kernels.fft_pallas import (
        _stream_geometry,
        stream_kernel_supported,
    )

    for taps in range(1, 258, 4):
        center = taps // 2
        for off in (0, max(0, taps - 1 - center), 64, 128):
            if not stream_kernel_supported(taps, off):
                continue
            c, d, m_shift, hop = _stream_geometry(taps, off)
            assert c == center
            assert 0 <= d < 128
            assert (off + center + d) % 128 == 0
            assert m_shift in (0, 1, 2)
            assert hop in (2, 3)
            if hop == 3:
                # 3-chunk valid window requires the wrap-free span to
                # start at or before chunk 1
                assert taps - 1 + d <= 128
