"""FM demod + full-chain tests (BASELINE config 5 shape)."""

import jax
import numpy as np
import pytest

from warmup_fir_filter_tpu.models.chain import (
    ChainConfig,
    chain_forward,
    chain_forward_sharded,
)
from warmup_fir_filter_tpu.ops.demod import (
    fm_demodulate,
    fm_demodulate_golden,
    fm_modulate,
)
from warmup_fir_filter_tpu.parallel import make_mesh


class TestFMDemod:
    def test_roundtrip_recovers_message(self, rng):
        k_f = 0.05
        message = rng.uniform(-1, 1, size=(3, 2000))
        re, im = fm_modulate(message, k_f)
        recovered = np.asarray(fm_demodulate(re, im, k_f), np.float64)
        # First sample undefined; rest must match the message closely.
        np.testing.assert_allclose(recovered[:, 1:], message[:, 1:],
                                   atol=1e-3)

    def test_constant_tone_gives_constant_freq(self):
        k_f = 0.1
        message = np.full((1, 500), 0.5)
        re, im = fm_modulate(message, k_f)
        out = fm_demodulate_golden(re, im, k_f)
        np.testing.assert_allclose(out[0, 1:], 0.5, atol=1e-9)

    def test_jnp_matches_golden(self, rng):
        k_f = 0.08
        message = rng.uniform(-1, 1, size=(2, 300))
        re, im = fm_modulate(message, k_f)
        np.testing.assert_allclose(
            np.asarray(fm_demodulate(re, im, k_f), np.float64),
            fm_demodulate_golden(re, im, k_f),
            atol=1e-4,
        )

    def test_invalid_kf_rejected(self):
        with pytest.raises(ValueError, match="k_f"):
            fm_demodulate(np.ones((1, 4)), np.ones((1, 4)), 0.0)


class TestChain:
    def test_chain_recovers_lowpass_message(self, rng):
        # Band-limited message → modulate → full chain; the recovered
        # message must correlate strongly with the (resampled) original.
        config = ChainConfig()
        t = np.arange(6000)
        message = 0.5 * np.cos(2 * np.pi * 0.002 * t)[None, :].repeat(2, 0)
        re, im = fm_modulate(message, config.demod_k_f)
        out = np.asarray(chain_forward(re, im, config), np.float64)
        assert out.shape[0] == 2
        assert out.shape[1] == -(-6000 * 2 // 3)
        # Compare against the message at the resampled rate (skip edges).
        t_out = np.arange(out.shape[1]) * 1.5
        expected = 0.5 * np.cos(2 * np.pi * 0.002 * t_out)
        core = slice(200, -200)
        corr = np.corrcoef(out[0, core], expected[core])[0, 1]
        assert corr > 0.99

    def test_sharded_chain_matches_single_device(self, rng, require_devices):
        mesh = make_mesh({"data": 4}, devices=require_devices(4))
        config = ChainConfig(channelizer_taps=33)
        message = rng.uniform(-1, 1, size=(8, 1200))
        re, im = fm_modulate(message, config.demod_k_f)
        single = np.asarray(chain_forward(
            jax.numpy.asarray(re, jax.numpy.float32),
            jax.numpy.asarray(im, jax.numpy.float32), config))
        sharded = np.asarray(chain_forward_sharded(re, im, config, mesh=mesh))
        np.testing.assert_allclose(sharded, single, atol=1e-5)

    def test_sharded_fused_backend_matches_single_device(
            self, rng, require_devices):
        """r4: the fused chain kernel under shard_map — each device runs
        the single-pass kernel on its local rows (8 channels/device
        here) and must equal the forced-fused single-device run."""
        import dataclasses

        mesh = make_mesh({"data": 2}, devices=require_devices(2))
        config = dataclasses.replace(ChainConfig(),
                                     channelizer_backend="fused")
        message = rng.uniform(-1, 1, size=(16, 2000))
        re, im = fm_modulate(message, config.demod_k_f)
        single = np.asarray(chain_forward(
            jax.numpy.asarray(re, jax.numpy.float32),
            jax.numpy.asarray(im, jax.numpy.float32), config))
        sharded = np.asarray(chain_forward_sharded(re, im, config,
                                                   mesh=mesh))
        np.testing.assert_array_equal(sharded, single)

    def test_indivisible_channels_rejected(self, rng, require_devices):
        mesh = make_mesh({"data": 4}, devices=require_devices(4))
        with pytest.raises(ValueError, match="divisible"):
            chain_forward_sharded(np.ones((3, 600)), np.ones((3, 600)),
                                  mesh=mesh)


def test_chain_pallas_channelizer_matches_jnp(rng):
    from warmup_fir_filter_tpu.models.chain import ChainConfig, chain_forward

    t = np.arange(30_000)
    re = np.stack([np.cos(2 * np.pi * 0.01 * t), np.sin(2 * np.pi * 0.007 * t)])
    im = np.stack([np.sin(2 * np.pi * 0.01 * t), np.cos(2 * np.pi * 0.007 * t)])
    ref = np.asarray(
        chain_forward(re, im, ChainConfig(channelizer_backend="jnp")),
        np.float64,
    )
    got = np.asarray(
        chain_forward(re, im, ChainConfig(channelizer_backend="pallas")),
        np.float64,
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_chain_unknown_channelizer_backend_rejected(rng):
    import pytest as _pytest

    from warmup_fir_filter_tpu.models.chain import ChainConfig, chain_forward

    with _pytest.raises(ValueError, match="channelizer_backend"):
        chain_forward(
            np.zeros((1, 4000), np.float32),
            np.zeros((1, 4000), np.float32),
            ChainConfig(channelizer_backend="cuda"),
        )


class TestTimeShardedFusedChain:
    """r5: the fused chain sharded along TIME (models/chain.py,
    chain_forward_time_sharded) must be BIT-identical to the
    single-device fused run — including at both stream edges, where the
    kernel's dynamic resampled-space window (rs_bounds) places the
    zero-pad exactly where the unsharded run does."""

    def test_bit_equal_vs_single_device(self, rng, require_devices):
        from warmup_fir_filter_tpu.kernels.chain_fused import (
            chain_forward_fused,
        )
        from warmup_fir_filter_tpu.models.chain import (
            chain_forward_time_sharded,
        )

        mesh = make_mesh({"data": 1, "time": 2},
                         devices=require_devices(2))
        cfg = ChainConfig()
        channels, t_local = 8, 12288   # out_ext 10240 → 2 programs/shard
        time = t_local * 2
        re = rng.standard_normal((channels, time)).astype(np.float32)
        im = rng.standard_normal((channels, time)).astype(np.float32)
        single = np.asarray(chain_forward_fused(
            re, im, cfg.resample_filter(), cfg.channelizer_filter(),
            cfg.resample_up, cfg.resample_down, cfg.demod_k_f,
            interpret=True))
        sharded = np.asarray(chain_forward_time_sharded(
            re, im, cfg, mesh=mesh))
        np.testing.assert_array_equal(sharded, single)

    def test_alignment_constraints_rejected(self, rng, require_devices):
        from warmup_fir_filter_tpu.models.chain import (
            chain_forward_time_sharded,
        )

        mesh = make_mesh({"data": 1, "time": 2},
                         devices=require_devices(2))
        bad = np.zeros((8, 2 * 12289), np.float32)  # T_local % down != 0
        with pytest.raises(ValueError, match="T_local"):
            chain_forward_time_sharded(bad, bad, ChainConfig(), mesh=mesh)
        # Aligned but too short for the halo: exchange_halo_1d would
        # silently clamp and misalign the retained window — must raise.
        short = np.zeros((8, 2 * 1152), np.float32)
        with pytest.raises(ValueError, match="halo width"):
            chain_forward_time_sharded(short, short, ChainConfig(),
                                       mesh=mesh)


class TestChainBf16Mode:
    """r5 opt-in bf16 STORAGE mode of the fused chain: half the
    input/scratch bytes, single-pass band dots, SNR-gated."""

    def test_snr_on_fm_signal(self, rng):
        from warmup_fir_filter_tpu.kernels.chain_fused import (
            chain_forward_fused,
        )
        from warmup_fir_filter_tpu.ops.fftfilt import (
            fir_overlap_save,
            snr_db,
        )
        from warmup_fir_filter_tpu.ops.resample import design_lowpass

        cfg = ChainConfig()
        msg = rng.standard_normal((8, 40_000)).astype(np.float32)
        msg = np.array(fir_overlap_save(msg, design_lowpass(63, 0.05)),
                       np.float32)
        msg = msg / np.abs(msg).max()
        re, im = fm_modulate(msg, cfg.demod_k_f)
        re = np.asarray(re, np.float32)
        im = np.asarray(im, np.float32)
        args = (cfg.resample_filter(), cfg.channelizer_filter(),
                cfg.resample_up, cfg.resample_down, cfg.demod_k_f)
        ref = np.asarray(chain_forward_fused(
            re, im, *args, interpret=True), np.float64)
        got = np.asarray(chain_forward_fused(
            re, im, *args, precision="bf16", interpret=True), np.float64)
        # measured ~53 dB on v5e and in interpret mode; gate with margin
        assert float(snr_db(ref, got)) > 40.0

    def test_unknown_precision_rejected(self):
        from warmup_fir_filter_tpu.kernels.chain_fused import (
            chain_forward_fused,
        )

        cfg = ChainConfig()
        x = np.zeros((8, 3000), np.float32)
        with pytest.raises(ValueError, match="precision"):
            chain_forward_fused(
                x, x, cfg.resample_filter(), cfg.channelizer_filter(),
                2, 3, cfg.demod_k_f, precision="fp8")

    def test_config_fused_precision_plumbed(self, rng):
        """ChainConfig.fused_precision reaches the fused kernel."""
        import dataclasses

        from warmup_fir_filter_tpu.kernels.chain_fused import (
            chain_forward_fused,
        )

        cfg = dataclasses.replace(ChainConfig(),
                                  channelizer_backend="fused",
                                  fused_precision="bf16")
        re = rng.standard_normal((8, 6000)).astype(np.float32)
        im = rng.standard_normal((8, 6000)).astype(np.float32)
        via_config = np.asarray(chain_forward(re, im, cfg))
        direct = np.asarray(chain_forward_fused(
            re, im, cfg.resample_filter(), cfg.channelizer_filter(),
            cfg.resample_up, cfg.resample_down, cfg.demod_k_f,
            precision="bf16", interpret=True))
        np.testing.assert_array_equal(via_config, direct)
