"""MXU banded-matmul resampler vs the float64 polyphase oracle.

The band construction is pure numpy; kernel agreement runs in interpret
mode on CPU (bf16x3 within its documented ~2⁻²¹ relative bound on
u8-scale data, "highest" tighter) and compiled on TPU via
bench_configs config 5.
"""

import numpy as np
import pytest

from warmup_fir_filter_tpu.kernels.resample_mxu import (
    build_resample_band,
    resample_poly_mxu,
)
from warmup_fir_filter_tpu.ops.resample import (
    design_lowpass,
    resample_poly,
    resample_poly_golden,
)


class TestResampleBand:
    def test_band_matches_plan_tile0(self, rng):
        # One (K, 128) matmul must reproduce the per-output polyphase
        # sum for the first output tile.
        up, down, num_taps = 2, 3, 63
        h = rng.uniform(-0.5, 0.5, num_taps)
        a, k_rows, ds, beta0, j_count = build_resample_band(h, up, down)
        assert ds == 128 * down // up
        n = 4096
        x = rng.standard_normal((2, n))
        gold = resample_poly_golden(x, h, up, down)
        # Window for tile 0 in float64 straight from the definition.
        first = beta0 - (j_count - 1)
        window = np.zeros((2, k_rows))
        for j in range(k_rows):
            pos = first + j
            if 0 <= pos < n:
                window[:, j] = x[:, pos]
        # The band is float32 (rounding ~6e-8 relative per tap, with
        # cancellation on near-zero outputs): structural agreement only.
        np.testing.assert_allclose(
            window @ a.astype(np.float64), gold[:, :128], rtol=1e-4,
            atol=1e-3,
        )

    def test_up_must_divide_128(self):
        with pytest.raises(ValueError, match="up | 128"):
            build_resample_band(np.ones(9), 3, 2)


@pytest.mark.parametrize("up,down", [(2, 3), (1, 2), (4, 3), (8, 5)])
def test_mxu_resample_matches_golden(rng, up, down):
    h = design_lowpass(63, 0.8 / max(up, down), gain=up)
    x = rng.integers(0, 256, size=(3, 2000)).astype(np.float32)
    got = np.asarray(resample_poly_mxu(x, h, up, down), np.float64)
    gold = resample_poly_golden(x, h, up, down)
    assert got.shape == gold.shape
    np.testing.assert_allclose(got, gold, rtol=1e-4, atol=0.02)


@pytest.mark.parametrize("group", [2, 4, 8])
def test_mxu_resample_grouped_band_matches_ungrouped(rng, group):
    # The aligned grouped band (perf knob, rejected as default — see
    # resample_mxu.py ablation note) must compute the same windows with
    # the offset absorbed into zero band rows; only f32 accumulation
    # order differs (longer dots), so agreement is near-ulp, not
    # bit-exact.
    h = design_lowpass(63, 1 / 3.0)
    x = rng.standard_normal((2, 40000)).astype(np.float32)
    base = np.asarray(resample_poly_mxu(x, h, 2, 3, precision="highest"))
    got = np.asarray(
        resample_poly_mxu(x, h, 2, 3, precision="highest", group=group)
    )
    np.testing.assert_allclose(got, base, rtol=2e-6, atol=1e-5)


def test_mxu_resample_highest_precision(rng):
    h = design_lowpass(63, 0.3, gain=2)
    x = rng.integers(0, 256, size=(2, 1500)).astype(np.float32)
    got = np.asarray(
        resample_poly_mxu(x, h, 2, 3, precision="highest"), np.float64)
    gold = resample_poly_golden(x, h, 2, 3)
    np.testing.assert_allclose(got, gold, rtol=1e-6, atol=1e-3)


def test_mxu_resample_segmented(rng):
    # Force multi-window segmentation (2 output tiles per segment).
    h = design_lowpass(63, 0.3, gain=2)
    x = rng.integers(0, 256, size=(2, 3000)).astype(np.float32)
    got = np.asarray(
        resample_poly_mxu(x, h, 2, 3, max_out_tiles=2), np.float64)
    gold = resample_poly_golden(x, h, 2, 3)
    assert got.shape == gold.shape
    np.testing.assert_allclose(got, gold, rtol=1e-4, atol=0.02)


def test_mxu_resample_wide_multi_superblock(rng):
    # ≥3 column superblocks of the grid-native wide path (seg_out =
    # 8192 outputs for up=2) with a ragged last block: covers the
    # stream-head zero halo, interior halo handoff, and tail masking.
    h = design_lowpass(63, 0.3, gain=2)
    x = rng.integers(0, 256, size=(3, 60_000)).astype(np.float32)
    got = np.asarray(resample_poly_mxu(x, h, 2, 3), np.float64)
    gold = resample_poly_golden(x, h, 2, 3)
    assert got.shape == gold.shape
    np.testing.assert_allclose(got, gold, rtol=1e-4, atol=0.02)


def test_mxu_resample_long_branch_fallback(rng):
    # J = 513 branch taps: outside the wide kernel's one-tile halo
    # budget (first_read < −128) — must fall back to the windowed path
    # and still match golden.
    h = design_lowpass(1025, 0.2, gain=2)
    x = rng.integers(0, 256, size=(2, 3000)).astype(np.float32)
    got = np.asarray(resample_poly_mxu(x, h, 2, 3), np.float64)
    gold = resample_poly_golden(x, h, 2, 3)
    np.testing.assert_allclose(got, gold, rtol=1e-4, atol=0.2)


def test_resample_poly_auto_dispatch_cpu_exact(rng):
    # On CPU "auto" stays on the exact slice path (bit-stable).  On
    # real hardware "auto" deliberately picks the bf16x3 MXU kernel, so
    # the bit-equality claim only holds on the CPU backend.
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("auto dispatch picks the MXU kernel on TPU by design")
    h = design_lowpass(33, 0.4, gain=2)
    x = rng.integers(0, 256, size=(2, 999)).astype(np.float32)
    got = np.asarray(resample_poly(x, h, 2, 3), np.float64)
    forced = np.asarray(
        resample_poly(x, h, 2, 3, precision="exact"), np.float64)
    np.testing.assert_array_equal(got, forced)


def test_resample_poly_forced_mxu_path(rng):
    h = design_lowpass(33, 0.4, gain=2)
    x = rng.integers(0, 256, size=(2, 999)).astype(np.float32)
    got = np.asarray(
        resample_poly(x, h, 2, 3, precision="bf16x3"), np.float64)
    gold = resample_poly_golden(x, h, 2, 3)
    np.testing.assert_allclose(got, gold, rtol=1e-4, atol=0.02)


def test_mxu_resample_chunked_matches_golden(rng):
    """Capped-unroll resample chunk kernel (explicit ``unroll=`` knob,
    non-default — r4 ablation, docs/roofline.md): multi-chunk windows
    must match the float64 oracle across chunk and superblock seams."""
    h = design_lowpass(63, 0.3, gain=2)
    x = rng.standard_normal((3, 6000)).astype(np.float32)
    gold = resample_poly_golden(x, h, 2, 3)
    got = np.asarray(
        resample_poly_mxu(x, h, 2, 3, precision="highest", unroll=4),
        np.float64)
    assert got.shape == gold.shape
    np.testing.assert_allclose(got, gold, rtol=1e-6, atol=1e-3)


def test_mxu_resample_group_validation(rng):
    h = design_lowpass(63, 1 / 3.0)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    with pytest.raises(ValueError, match="group must be >= 1"):
        resample_poly_mxu(x, h, 2, 3, group=0)
    with pytest.raises(ValueError, match="multiple of up"):
        resample_poly_mxu(x, h, 2, 3, unroll=3)
