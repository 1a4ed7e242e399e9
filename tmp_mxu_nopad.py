"""Prototype v3: no-pad MXU FIR — raw input, in-kernel halo + masking."""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warmup_fir_filter_tpu.kernels.fir_mxu import (
    LANE, build_band_matrices, _round_up)
from warmup_fir_filter_tpu.models.filters import FILTER_BANK_5TAP, FILTER_BANK_3TAP
from warmup_fir_filter_tpu.models.golden import fir1d_fixed_golden_rows
from warmup_fir_filter_tpu.ops.qformat import QFormat
from warmup_fir_filter_tpu.utils.benchmarking import chained_throughput


def _kernel_v3(bias_ref, a_ref, head_ref, body_ref, tail_ref, o_ref, *,
               exponents, col_tiles, frac_bits, acc_bits, needs_wrap,
               spill, left, n_total):
    t = pl.program_id(1)
    bias = bias_ref[0, 0]

    def _rebias(u8):
        return pltpu.bitcast(u8 ^ jnp.uint8(0x80), jnp.int8)

    block_rows = body_ref.shape[0]
    width = col_tiles * LANE
    base = t * width
    col = jax.lax.broadcasted_iota(jnp.int32, (block_rows, width), 1)
    x_body = _rebias(jnp.where(col < n_total - base, body_ref[:], jnp.uint8(0)))
    # head valid iff t > 0; scalar-bool where is an unsupported sublane
    # broadcast in Mosaic — use a vector compare against a scalar bound.
    hcol = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 1)
    head_bound = jnp.where(t > 0, LANE, 0)
    x_head = _rebias(jnp.where(hcol < head_bound, head_ref[:], jnp.uint8(0)))
    tcol = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 1)
    x_tail = _rebias(
        jnp.where(tcol < n_total - (base + width), tail_ref[:], jnp.uint8(0)))

    kk = LANE + spill
    for tl in range(col_tiles):
        parts = []
        if tl == 0:
            if left:
                parts.append(x_head[:, LANE - left:])
            lo = 0
            have_off = left
        else:
            lo = tl * LANE - left
            have_off = 0
        if tl == col_tiles - 1:
            parts.append(x_body[:, lo:])
            need_tail = kk - have_off - (width - lo)
            if need_tail > 0:
                parts.append(x_tail[:, :need_tail])
        else:
            parts.append(x_body[:, lo: lo + kk - have_off])
        window = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

        acc = jnp.full((block_rows, LANE), bias, jnp.int32)
        for plane, b in enumerate(exponents):
            prod = jnp.dot(window, a_ref[plane],
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
        o_ref[:, tl * LANE:(tl + 1) * LANE] = (
            jnp.clip(final, 0, 255).astype(jnp.uint8))


@functools.partial(
    jax.jit,
    static_argnames=("exponents", "frac_bits", "acc_bits", "block_rows",
                     "col_tiles", "needs_wrap", "left", "n_total", "batch"),
)
def _fir_mxu_nopad(x, a, bias, exponents, frac_bits, acc_bits,
                   block_rows, col_tiles, needs_wrap, left, n_total, batch):
    depth = len(exponents)
    width = col_tiles * LANE
    grid = (-(-batch // block_rows), -(-n_total // width))
    total128 = -(-n_total // LANE)
    c = col_tiles
    in_specs = [
        pl.BlockSpec((1, 1), lambda r, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((depth, a.shape[1], LANE), lambda r, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, LANE),
                     lambda r, t: (r, jnp.where(t > 0, t * c - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, width), lambda r, t: (r, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, LANE),
                     lambda r, t: (r, jnp.minimum(t * c + c, total128 - 1)),
                     memory_space=pltpu.VMEM),
    ]
    kern = functools.partial(
        _kernel_v3, exponents=exponents, col_tiles=col_tiles,
        frac_bits=frac_bits, acc_bits=acc_bits, needs_wrap=needs_wrap,
        spill=a.shape[1] - LANE, left=left, n_total=n_total)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, width), lambda r, t: (r, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, n_total), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(bias, a, x, x, x)


def fir_nopad(x_u8, h, qformat=QFormat(), block_rows=None, col_tiles=None):
    h_fixed = qformat.quantize_coeffs(h).astype(np.int64)
    num_taps = int(h_fixed.size)
    center = num_taps // 2
    a_stacked, exponents = build_band_matrices(h_fixed)
    worst = 255 * int(np.abs(h_fixed).sum()) + (1 << (qformat.frac_bits - 1))
    needs_wrap = worst >= (1 << (qformat.acc_bits - 1))
    bias_val = 128 * int(h_fixed.sum())
    if not needs_wrap:
        bias_val += 1 << (qformat.frac_bits - 1)
    bias_val &= 0xFFFFFFFF
    if bias_val >= 1 << 31:
        bias_val -= 1 << 32
    bias = np.asarray([[bias_val]], np.int32)
    x_u8 = jnp.asarray(x_u8, dtype=jnp.uint8)
    batch, n = x_u8.shape
    if col_tiles is None:
        col_tiles = int(min(32, max(1, -(-n // LANE))))
    if block_rows is None:
        block_rows = int(min(512, _round_up(max(batch, 1), 8)))
    left = num_taps - 1 - center
    return _fir_mxu_nopad(
        x_u8, jnp.asarray(a_stacked), jnp.asarray(bias), exponents,
        qformat.frac_bits, qformat.acc_bits, block_rows, col_tiles,
        needs_wrap, left, n, batch)


def main():
    rng = np.random.default_rng(1)
    # correctness matrix: taps x shapes (incl. unaligned) x qformats
    shapes = [(16, 8192), (3, 100), (5, 257), (7, 128), (1, 64), (9, 1000)]
    banks = [np.asarray(FILTER_BANK_5TAP[k]) for k in FILTER_BANK_5TAP] + [
        np.asarray(FILTER_BANK_3TAP[k]) for k in FILTER_BANK_3TAP]
    qfs = [QFormat(), QFormat(acc_bits=16), QFormat(coeff_bits=8, frac_bits=4)]
    bad = 0
    for shape in shapes:
        x = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for h in banks:
            for qf in qfs:
                want = fir1d_fixed_golden_rows(x, h, qf)
                got = np.asarray(fir_nopad(x, h, qf))
                if not np.array_equal(want, got):
                    bad += 1
                    print(f"MISMATCH shape={shape} taps={h.size} qf={qf}")
    print(f"correctness: {'ALL EXACT' if bad == 0 else f'{bad} mismatches'}")
    sys.stdout.flush()

    h = np.asarray(FILTER_BANK_5TAP["sharpen"])
    BATCH, WIDTH = 19456, 8192
    x = rng.integers(0, 256, size=(BATCH, WIDTH), dtype=np.uint8)
    x_dev = jax.device_put(jnp.asarray(x))
    n = x.size
    r = chained_throughput(lambda a: fir_nopad(a, h), x_dev)
    print(f"v3_nopad: {n / r['seconds_per_apply'] / 1e9:8.1f} Gsps")
    # pad-cost probe for the record
    r2 = chained_throughput(
        lambda a: jnp.pad(a[:, LANE:], ((0, 0), (0, LANE))), x_dev)
    print(f"pad-only pass: {n / r2['seconds_per_apply'] / 1e9:8.1f} Gsps")


if __name__ == "__main__":
    main()
