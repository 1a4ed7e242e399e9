"""Pipeline-parallel executor + synthetic corpus tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warmup_fir_filter_tpu.parallel.pipeline_parallel import PipelinedChain
from warmup_fir_filter_tpu.pipeline.synthetic import (
    DEFAULT_SPECS,
    synthesize_corpus,
)


class TestPipelinedChain:
    def test_stages_on_distinct_devices(self):
        devices = jax.devices()
        stages = [
            lambda x: x * 2.0,
            lambda x: x + 1.0,
            lambda x: x - 0.5,
        ]
        chain = PipelinedChain(stages, devices=devices[:3])
        assert len(set(chain.placements)) == min(3, len(devices[:3]))

    def test_microbatch_results_match_sequential(self, rng):
        stages = [
            lambda x: x * 2.0,
            lambda x: jnp.tanh(x),
            lambda x: x.sum(axis=-1),
        ]
        chain = PipelinedChain(stages, devices=jax.devices()[:3])
        batches = [rng.normal(size=(4, 16)).astype(np.float32)
                   for _ in range(5)]
        out = chain.run_microbatches(batches)
        for got, batch in zip(out, batches):
            expected = np.tanh(batch * 2.0).sum(axis=-1)
            np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_single_device_degrades_gracefully(self, rng):
        chain = PipelinedChain([lambda x: x + 1], devices=jax.devices()[:1])
        out = chain.run_microbatches([np.zeros((2, 2), np.float32)])
        np.testing.assert_array_equal(out[0], np.ones((2, 2)))

    def test_empty_stages_rejected(self):
        with pytest.raises(ValueError, match="stages"):
            PipelinedChain([])

    def test_dsp_chain_stages_pipelined(self, rng):
        # Realistic: FIR stage → abs stage → decimate stage on 3 devices.
        from warmup_fir_filter_tpu.ops.fir1d import fir1d_ideal_rows_jnp

        h = np.array([0.25, 0.5, 0.25])
        stages = [
            lambda x: fir1d_ideal_rows_jnp(x, h),
            lambda x: jnp.abs(x),
            lambda x: x[:, ::2],
        ]
        chain = PipelinedChain(stages, devices=jax.devices()[:3])
        batches = [rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
                   for _ in range(3)]
        out = chain.run_microbatches(batches)
        for got, batch in zip(out, batches):
            expected = np.abs(
                np.asarray(fir1d_ideal_rows_jnp(batch, h))
            )[:, ::2]
            np.testing.assert_allclose(got, expected, atol=1e-5)


class TestSyntheticCorpus:
    def test_generates_deterministic_pngs(self, tmp_path):
        paths = synthesize_corpus(tmp_path / "img")
        assert len(paths) == len(DEFAULT_SPECS)
        from warmup_fir_filter_tpu.utils.imageio import load_gray_u8

        first = load_gray_u8(paths[0])
        assert first.shape == (512, 768)
        # Regenerating with the same seed is byte-identical.
        again = synthesize_corpus(tmp_path / "img2")
        np.testing.assert_array_equal(first, load_gray_u8(again[0]))

    def test_idempotent_no_overwrite(self, tmp_path):
        paths = synthesize_corpus(tmp_path / "img")
        mtimes = [p.stat().st_mtime_ns for p in paths]
        synthesize_corpus(tmp_path / "img")
        assert [p.stat().st_mtime_ns for p in paths] == mtimes

    def test_pipeline_runs_on_synthetic_corpus(self, tmp_path):
        from warmup_fir_filter_tpu.cli import run_pipeline

        img_dir = tmp_path / "img"
        synthesize_corpus(
            img_dir,
            specs=(("img_a", "gradient", (16, 24)),
                   ("img_b", "noise", (16, 16))),
        )
        result = run_pipeline(
            image_dir=img_dir,
            artifact_root=tmp_path / "artifacts",
            tap="3",
            backend="golden",
            skip_restore=True,
        )
        assert result["stages"]["input"]["generated"] == 2
        assert result["stages"]["report_3tap"]["num_cases"] == 8
