"""SPMD collective pipeline: schedule correctness on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warmup_fir_filter_tpu.parallel import make_mesh
from warmup_fir_filter_tpu.parallel.spmd_pipeline import spmd_pipeline


def _mesh(num_stages):
    devices = jax.devices()
    if len(devices) < num_stages:
        pytest.skip(f"needs {num_stages} devices")
    return make_mesh({"stage": num_stages}, devices=devices[:num_stages])


class TestSpmdPipeline:
    def test_matches_sequential_float(self, rng):
        mesh = _mesh(4)

        def stage_fn(s, x):
            return x * 2.0 + s.astype(jnp.float32)

        batches = rng.normal(size=(7, 4, 16)).astype(np.float32)
        out = np.asarray(spmd_pipeline(stage_fn, batches, mesh=mesh))
        expected = batches
        for s in range(4):
            expected = expected * 2.0 + float(s)
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_heterogeneous_stages_via_switch(self, rng):
        mesh = _mesh(4)
        branches = [
            lambda x: x + 1.0,
            lambda x: x * 3.0,
            lambda x: jnp.tanh(x),
            lambda x: x - 0.5,
        ]

        def stage_fn(s, x):
            return jax.lax.switch(s, branches, x)

        batches = rng.normal(size=(5, 2, 8)).astype(np.float32)
        out = np.asarray(spmd_pipeline(stage_fn, batches, mesh=mesh))
        expected = batches
        for fn in branches:
            expected = np.asarray(jax.vmap(fn)(expected))
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    def test_fixed_fir_filter_chain_bit_exact(self, rng):
        """DSP-real pipeline: each stage applies a different fixed FIR
        from a parameter bank, bit-exact vs sequential golden."""
        from warmup_fir_filter_tpu.models.filters import FILTER_BANK_3TAP
        from warmup_fir_filter_tpu.models.golden import (
            fir1d_fixed_golden_rows,
        )
        from warmup_fir_filter_tpu.ops.fir1d import (
            fixed_fir_prehaloed_i32,
            pad_rows_same_mode,
        )
        from warmup_fir_filter_tpu.ops.qformat import QFormat

        mesh = _mesh(2)
        qf = QFormat()
        names = ["simple_lp", "moving_avg"]
        bank = np.stack(
            [qf.quantize_coeffs(FILTER_BANK_3TAP[n]).astype(np.int32)
             for n in names]
        )
        bank_dev = jnp.asarray(bank)

        def stage_fn(s, x_u8):
            h = bank_dev[s]
            xp = pad_rows_same_mode(x_u8.astype(jnp.int32), 3)
            return fixed_fir_prehaloed_i32(
                xp, h, 3, qf.frac_bits, qf.acc_bits
            )

        batches = rng.integers(0, 256, size=(6, 3, 32), dtype=np.uint8)
        out = np.asarray(spmd_pipeline(stage_fn, batches, mesh=mesh))
        for m in range(batches.shape[0]):
            expected = batches[m]
            for n in names:
                expected = fir1d_fixed_golden_rows(
                    expected, np.asarray(FILTER_BANK_3TAP[n])
                )
            np.testing.assert_array_equal(out[m], expected, err_msg=f"m={m}")

    @pytest.mark.parametrize("num_batches", [1, 3])
    def test_short_streams(self, rng, num_batches):
        mesh = _mesh(4)
        batches = rng.normal(size=(num_batches, 2, 4)).astype(np.float32)
        out = np.asarray(
            spmd_pipeline(lambda s, x: x + 1.0, batches, mesh=mesh)
        )
        np.testing.assert_allclose(out, batches + 4.0, rtol=1e-6)

    def test_empty_stream(self):
        mesh = _mesh(2)
        batches = np.zeros((0, 2, 4), np.float32)
        out = spmd_pipeline(lambda s, x: x, batches, mesh=mesh)
        assert out.shape == (0, 2, 4)
