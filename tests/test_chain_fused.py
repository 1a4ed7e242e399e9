"""Fused single-pass chain kernel vs the staged ops (interpret mode).

The fused kernel (``kernels/chain_fused.py``) must reproduce the staged
resample → channelize → demod composition (``models/chain.py``) on a
realistic FM workload, including stream edges, superblock seams, the
ragged tail, and the demod first-sample-zero contract.
"""

import dataclasses

import numpy as np
import pytest

from warmup_fir_filter_tpu.kernels.chain_fused import (
    atan2_poly,
    chain_forward_fused,
    chain_fused_supported,
)
from warmup_fir_filter_tpu.models.chain import ChainConfig, chain_forward
from warmup_fir_filter_tpu.ops.demod import fm_modulate


def _snr_db(got, ref):
    err = ((got - ref) ** 2).mean()
    return 10 * np.log10(ref.astype(np.float64).var() / max(err, 1e-300))


@pytest.fixture(scope="module")
def fm_signal():
    cfg = ChainConfig()
    rng = np.random.default_rng(11)
    channels, time_len = 8, 2 * 64 * 192 + 777  # 2 superblocks + ragged
    msg = rng.standard_normal((channels, time_len)) * 0.3
    re, im = fm_modulate(msg, cfg.demod_k_f)
    return cfg, re.astype(np.float32), im.astype(np.float32)


class TestAtan2Poly:
    def test_matches_numpy(self, rng):
        y = rng.standard_normal((4, 256)).astype(np.float32)
        x = rng.standard_normal((4, 256)).astype(np.float32)
        got = np.asarray(atan2_poly(y, x))
        np.testing.assert_allclose(got, np.arctan2(y, x), atol=5e-7)

    def test_edge_cases(self):
        y = np.array([[0.0, 0.0, 1.0, -1.0, 0.0, -0.0]], np.float32)
        x = np.array([[0.0, 1.0, 0.0, 0.0, -1.0, -1.0]], np.float32)
        got = np.asarray(atan2_poly(y, x))
        np.testing.assert_allclose(got, np.arctan2(y, x), atol=5e-7)


class TestSupported:
    def test_flagship_supported(self):
        assert chain_fused_supported(16, 2, 3, 63, 63)

    def test_gates(self):
        assert not chain_fused_supported(16, 3, 2, 63, 63)   # 3 ∤ 128
        assert not chain_fused_supported(12, 2, 3, 63, 63)   # C % 8
        assert not chain_fused_supported(200, 2, 3, 63, 63)  # 2C > 256
        assert not chain_fused_supported(16, 2, 3, 63, 999)  # taps > 257

    def test_forced_fused_unsupported_raises(self, fm_signal):
        cfg, re, im = fm_signal
        bad = dataclasses.replace(cfg, channelizer_backend="fused",
                                  resample_up=3, resample_down=2)
        with pytest.raises(ValueError, match="fused"):
            chain_forward(re, im, bad)


class TestFusedChainParity:
    def test_bf16x3_matches_staged(self, fm_signal):
        cfg, re, im = fm_signal
        staged = np.asarray(
            chain_forward(re, im, dataclasses.replace(
                cfg, channelizer_backend="mxu")), np.float64)
        fused = np.asarray(chain_forward_fused(
            re, im, cfg.resample_filter(), cfg.channelizer_filter(),
            cfg.resample_up, cfg.resample_down, cfg.demod_k_f),
            np.float64)
        assert fused.shape == staged.shape
        assert _snr_db(fused, staged) > 90.0

    def test_highest_precision(self, fm_signal):
        cfg, re, im = fm_signal
        staged = np.asarray(
            chain_forward(re, im, dataclasses.replace(
                cfg, channelizer_backend="mxu")), np.float64)
        fused = np.asarray(chain_forward_fused(
            re, im, cfg.resample_filter(), cfg.channelizer_filter(),
            cfg.resample_up, cfg.resample_down, cfg.demod_k_f,
            precision="highest"), np.float64)
        assert _snr_db(fused, staged) > 95.0

    def test_first_sample_zero(self, fm_signal):
        cfg, re, im = fm_signal
        fused = np.asarray(chain_forward_fused(
            re, im, cfg.resample_filter(), cfg.channelizer_filter(),
            cfg.resample_up, cfg.resample_down, cfg.demod_k_f))
        np.testing.assert_array_equal(fused[:, 0], 0.0)

    def test_backend_fused_dispatch(self, fm_signal):
        cfg, re, im = fm_signal
        via_model = np.asarray(chain_forward(
            re, im, dataclasses.replace(cfg, channelizer_backend="fused")))
        direct = np.asarray(chain_forward_fused(
            re, im, cfg.resample_filter(), cfg.channelizer_filter(),
            cfg.resample_up, cfg.resample_down, cfg.demod_k_f))
        np.testing.assert_array_equal(via_model, direct)

    def test_validation(self, fm_signal):
        cfg, re, im = fm_signal
        h_rs, h_ch = cfg.resample_filter(), cfg.channelizer_filter()
        with pytest.raises(ValueError, match="precision"):
            chain_forward_fused(re, im, h_rs, h_ch, 2, 3, 0.05,
                                precision="fast")
        with pytest.raises(ValueError, match="k_f"):
            chain_forward_fused(re, im, h_rs, h_ch, 2, 3, -1.0)
        with pytest.raises(ValueError, match="matching"):
            chain_forward_fused(re[:, :-1], im, h_rs, h_ch, 2, 3, 0.05)


@pytest.mark.parametrize("up,down,rs_taps,ch_taps,channels", [
    (2, 3, 63, 63, 8),      # flagship geometry
    (4, 3, 47, 31, 8),      # larger upsample, shorter filters
    (2, 1, 33, 97, 8),      # pure upsample, long channelizer
    (8, 5, 63, 129, 16),    # deep polyphase, max merged channelizer
    (1, 2, 31, 63, 8),      # pure decimation
    (2, 3, 95, 63, 24),     # longer resampler branches, 24 channels
])
def test_fused_config_sweep_matches_staged(rng, up, down, rs_taps,
                                           ch_taps, channels):
    """Every supported (up, down, taps, channels) geometry must agree
    with the staged composition — the fused kernel's margins, strides,
    and scratch offsets are all config-dependent."""
    from warmup_fir_filter_tpu.ops.resample import design_lowpass

    assert chain_fused_supported(channels, up, down, rs_taps, ch_taps)
    cfg = dataclasses.replace(
        ChainConfig(), resample_up=up, resample_down=down,
        resample_taps=rs_taps, channelizer_taps=ch_taps,
        channelizer_backend="mxu")
    h_rs = cfg.resample_filter()
    h_ch = cfg.channelizer_filter()
    t_len = 64 * 128 * down // up + 333  # >1 superblock + ragged tail
    msg = rng.standard_normal((channels, t_len)) * 0.3
    re, im = fm_modulate(msg, cfg.demod_k_f)
    re, im = re.astype(np.float32), im.astype(np.float32)
    staged = np.asarray(chain_forward(re, im, cfg), np.float64)
    fused = np.asarray(chain_forward_fused(
        re, im, h_rs, h_ch, up, down, cfg.demod_k_f), np.float64)
    assert fused.shape == staged.shape
    assert _snr_db(fused, staged) > 85.0, (up, down, rs_taps, ch_taps)
