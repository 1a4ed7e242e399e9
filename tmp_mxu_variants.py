"""Prototype MXU FIR variants: u8-direct dot, contiguous-K matmuls."""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warmup_fir_filter_tpu.kernels.fir_mxu import (
    LANE, build_band_matrices, _round_up)
from warmup_fir_filter_tpu.models.filters import FILTER_BANK_5TAP
from warmup_fir_filter_tpu.models.golden import fir1d_fixed_golden_rows
from warmup_fir_filter_tpu.ops.qformat import QFormat
from warmup_fir_filter_tpu.utils.benchmarking import chained_throughput


def _kernel_v1(bias_ref, a_ref, body_ref, tail_ref, o_ref, *,
               exponents, col_tiles, frac_bits, acc_bits, needs_wrap, spill):
    """u8-direct dot: no rebias, bias = rounding only."""
    bias = bias_ref[0, 0]
    x_body = body_ref[:]
    x_tail = tail_ref[:]
    block_rows = x_body.shape[0]
    for t in range(col_tiles):
        xt = x_body[:, t * LANE:(t + 1) * LANE]
        if t + 1 < col_tiles:
            corner = x_body[:, (t + 1) * LANE:(t + 1) * LANE + spill]
        else:
            corner = x_tail[:, :spill]
        acc = jnp.full((block_rows, LANE), bias, jnp.int32)
        for plane, b in enumerate(exponents):
            prod = jnp.dot(xt, a_ref[plane, :LANE, :],
                           preferred_element_type=jnp.int32)
            prod = prod + jnp.dot(corner, a_ref[plane, LANE:, :],
                                  preferred_element_type=jnp.int32)
            acc = acc + (prod << (8 * b) if b else prod)
        if needs_wrap:
            if acc_bits < 32:
                shift = 32 - acc_bits
                acc = (acc << shift) >> shift
            low = acc & ((1 << frac_bits) - 1)
            carry = (low + (1 << (frac_bits - 1))) >> frac_bits
            final = (acc >> frac_bits) + carry
        else:
            final = acc >> frac_bits
        o_ref[:, t * LANE:(t + 1) * LANE] = (
            jnp.clip(final, 0, 255).astype(jnp.uint8))


def _kernel_v2(bias_ref, a_ref, body_ref, tail_ref, o_ref, *,
               exponents, col_tiles, frac_bits, acc_bits, needs_wrap, spill):
    """u8-direct + ONE contiguous K=128+spill matmul per digit per tile."""
    bias = bias_ref[0, 0]
    x_body = body_ref[:]
    x_tail = tail_ref[:]
    block_rows = x_body.shape[0]
    kk = LANE + spill
    for t in range(col_tiles):
        if t + 1 < col_tiles:
            xt = x_body[:, t * LANE: t * LANE + kk]
        else:
            xt = jnp.concatenate(
                [x_body[:, t * LANE:(t + 1) * LANE], x_tail[:, :spill]],
                axis=1)
        acc = jnp.full((block_rows, LANE), bias, jnp.int32)
        for plane, b in enumerate(exponents):
            prod = jnp.dot(xt, a_ref[plane], preferred_element_type=jnp.int32)
            acc = acc + (prod << (8 * b) if b else prod)
        if needs_wrap:
            if acc_bits < 32:
                shift = 32 - acc_bits
                acc = (acc << shift) >> shift
            low = acc & ((1 << frac_bits) - 1)
            carry = (low + (1 << (frac_bits - 1))) >> frac_bits
            final = (acc >> frac_bits) + carry
        else:
            final = acc >> frac_bits
        o_ref[:, t * LANE:(t + 1) * LANE] = (
            jnp.clip(final, 0, 255).astype(jnp.uint8))


def _make(kernel_fn):
    @functools.partial(
        jax.jit,
        static_argnames=("exponents", "frac_bits", "acc_bits", "block_rows",
                         "col_tiles", "needs_wrap"),
    )
    def padded(x_ext, a, bias, exponents, frac_bits, acc_bits,
               block_rows, col_tiles, needs_wrap):
        b_pad, w_in = x_ext.shape
        w_out = w_in - LANE
        depth = len(exponents)
        grid = (b_pad // block_rows, w_out // (col_tiles * LANE))
        in_specs = [
            pl.BlockSpec((1, 1), lambda r, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((depth, a.shape[1], LANE), lambda r, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, col_tiles * LANE), lambda r, t: (r, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANE),
                         lambda r, t: (r, t * col_tiles + col_tiles),
                         memory_space=pltpu.VMEM),
        ]
        kern = functools.partial(
            kernel_fn, exponents=exponents, col_tiles=col_tiles,
            frac_bits=frac_bits, acc_bits=acc_bits, needs_wrap=needs_wrap,
            spill=a.shape[1] - LANE)
        return pl.pallas_call(
            kern, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((block_rows, col_tiles * LANE),
                                   lambda r, t: (r, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b_pad, w_out), jnp.uint8),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(bias, a, x_ext, x_ext)
    return padded


def run_variant(kernel_fn, x_u8, h, qformat=QFormat(), block_rows=512,
                col_tiles=32):
    h_fixed = qformat.quantize_coeffs(h).astype(np.int64)
    num_taps = int(h_fixed.size)
    center = num_taps // 2
    a_stacked, exponents = build_band_matrices(h_fixed)
    worst_acc = 255 * int(np.abs(h_fixed).sum()) + (1 << (qformat.frac_bits - 1))
    needs_wrap = worst_acc >= (1 << (qformat.acc_bits - 1))
    bias_val = 0 if needs_wrap else (1 << (qformat.frac_bits - 1))
    bias = np.asarray([[bias_val]], np.int32)
    x_u8 = jnp.asarray(x_u8, dtype=jnp.uint8)
    batch, n = x_u8.shape
    b_pad = _round_up(max(batch, 1), block_rows)
    n_pad = _round_up(max(n, 1), col_tiles * LANE)
    left = num_taps - 1 - center
    x_ext = jnp.pad(x_u8, ((0, b_pad - batch), (left, n_pad + LANE - left - n)))
    out = _make(kernel_fn)(
        x_ext, jnp.asarray(a_stacked), jnp.asarray(bias), exponents,
        qformat.frac_bits, qformat.acc_bits, block_rows, col_tiles, needs_wrap)
    return out[:batch, :n]


def main():
    h = np.asarray(FILTER_BANK_5TAP["sharpen"])
    rng = np.random.default_rng(0)
    BATCH, WIDTH = 19456, 8192
    x = rng.integers(0, 256, size=(BATCH, WIDTH), dtype=np.uint8)
    x_dev = jax.device_put(jnp.asarray(x))
    n = x.size
    golden = fir1d_fixed_golden_rows(x[:16], h)

    # Also exercise a wraparound-path filter (edge has big coeffs? use
    # acc_bits=16 to force the wrap path).
    qf_wrap = QFormat(acc_bits=16)
    golden_wrap = fir1d_fixed_golden_rows(x[:16], h, qf_wrap)

    for name, kern in (("v1_u8direct", _kernel_v1),
                       ("v2_contigK", _kernel_v2)):
        try:
            got = np.asarray(run_variant(kern, x[:16], h))
            ok = np.array_equal(got, golden)
            got_w = np.asarray(run_variant(kern, x[:16], h, qf_wrap))
            ok_w = np.array_equal(got_w, golden_wrap)
            r = chained_throughput(lambda a, k=kern: run_variant(k, a, h), x_dev)
            print(f"{name}: exact={ok} exact_wrap={ok_w} "
                  f"{n / r['seconds_per_apply'] / 1e9:8.1f} Gsps")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
