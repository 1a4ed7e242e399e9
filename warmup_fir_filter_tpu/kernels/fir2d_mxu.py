"""MXU Pallas kernel: bit-exact fixed-point dense 2-D FIR.

Extends the 1-D band-matrix formulation (``fir_mxu.py``) to dense
(Lr × Lc) kernels: the column dimension uses the same signed-base-256
banded int8 matmuls per tap-row, and the row dimension is realized with
**static row-shifted views** of the program's input block.

The row halo cannot be expressed with overlapping BlockSpecs; instead a
small extra operand delivers it: alongside the (BR, C·128) body block at
row-block index ``r``, a ``(TAIL_R, C·128)`` *row-tail* operand is
mapped at block index ``(r+1)·BR/TAIL_R`` of the same padded array —
i.e. the first ``TAIL_R ≥ Lr-1`` rows of the *next* block — so every
program sees ``BR + TAIL_R`` contiguous rows at ~1.02× read traffic.
The analogous column-tail and corner operands complete the halo.

Output pixel (i, n) of a block reads padded rows ``i + (Lr-1) - kr``:
tap-row ``kr`` therefore consumes the static row-slice
``[(Lr-1-kr), (Lr-1-kr) + BR)`` of the extended block, and accumulates
through the 1-D column machinery with the matrices built from
``h_fixed[kr, :]``.  Everything funnels into one int32 accumulator and
one epilogue, so the result is bit-identical to
``ops/fir2d.py::fir2d_fixed_golden``.

Performance crossover (measured on v5e): each tap-row digit costs two
128-wide MXU passes per output tile (~2560 MAC-slots/sample for a 5×5),
so for *small* dense kernels the fused VPU path
(``ops/fir2d.py::fir2d_fixed_jnp``, Lr·Lc true MACs) is as fast or
faster — both ≈21 Gsps for 5×5 — and remains the pipeline default; this
kernel pays off as Lr·Lc grows past ~100 taps where the VPU MAC count
dominates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warmup_fir_filter_tpu.kernels.fir_mxu import (
    LANE,
    build_band_matrices,
)
from warmup_fir_filter_tpu.ops.qformat import QFormat

DEFAULT_BLOCK_ROWS = 256
DEFAULT_COL_TILES = 16


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def build_band_matrices_2d(h_fixed: np.ndarray):
    """Per-tap-row banded planes, all padded to a common K.

    Returns ``(stacked, plan, k_width)`` where ``stacked`` is
    ``(P, K, 128)`` int8, and ``plan`` is a static tuple of
    ``(row_shift, exponent, plane_index)`` triples — ``row_shift`` is
    the static row-slice offset ``Lr-1-kr``.
    """
    h_fixed = np.asarray(h_fixed, dtype=np.int64)
    taps_r, taps_c = h_fixed.shape
    per_row = [build_band_matrices(h_fixed[kr]) for kr in range(taps_r)]
    k_width = max(planes.shape[1] for planes, _ in per_row)
    stacked: list[np.ndarray] = []
    plan: list[tuple[int, int, int]] = []
    for kr, (planes, exponents) in enumerate(per_row):
        if not np.any(h_fixed[kr]):
            continue
        for p, b in enumerate(exponents):
            padded = np.zeros((k_width, LANE), np.int8)
            padded[: planes.shape[1]] = planes[p]
            plan.append((taps_r - 1 - kr, b, len(stacked)))
            stacked.append(padded)
    if not stacked:
        stacked.append(np.zeros((k_width, LANE), np.int8))
        plan.append((0, 0, 0))
    return np.stack(stacked), tuple(plan), k_width


def _fir2d_mxu_kernel(
    bias_ref,      # (1, 1) int32 SMEM
    a_ref,         # (P, K, 128) int8
    body_ref,      # (BR, C·128) uint8
    col_tail_ref,  # (BR, 128) uint8
    row_tail_ref,  # (TAIL_R, C·128) uint8
    corner_ref,    # (TAIL_R, 128) uint8
    o_ref,         # (BR, C·128) uint8
    *,
    plan: tuple[tuple[int, int, int], ...],
    col_tiles: int,
    spill: int,
    frac_bits: int,
    acc_bits: int,
    needs_wrap: bool,
):
    bias = bias_ref[0, 0]

    def _rebias(u8):
        return pltpu.bitcast(u8 ^ jnp.uint8(0x80), jnp.int8)

    x_full = jnp.concatenate(
        [_rebias(body_ref[:]), _rebias(row_tail_ref[:])], axis=0
    )  # (BR + TAIL_R, C·128)
    x_tail = jnp.concatenate(
        [_rebias(col_tail_ref[:]), _rebias(corner_ref[:])], axis=0
    )  # (BR + TAIL_R, 128)

    block_rows = body_ref.shape[0]
    flat = (block_rows * col_tiles, LANE)

    acc = jnp.full(flat, bias, jnp.int32)
    windows_cache: dict[int, jnp.ndarray] = {}
    for row_shift, b, plane in plan:
        if row_shift not in windows_cache:
            xb = x_full[row_shift : row_shift + block_rows, :]
            xt = x_tail[row_shift : row_shift + block_rows, :]
            s0 = xb.reshape(flat)
            if col_tiles > 1:
                s1 = jnp.concatenate([xb[:, LANE:], xt], axis=1).reshape(flat)
            else:
                s1 = xt.reshape(flat)
            windows_cache[row_shift] = jnp.concatenate(
                [s0, s1[:, :spill]], axis=1
            )
        windows = windows_cache[row_shift]
        prod = jnp.dot(
            windows, a_ref[plane, : LANE + spill, :],
            preferred_element_type=jnp.int32,
        )
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

    o_ref[:] = jnp.clip(final, 0, 255).astype(jnp.uint8).reshape(
        block_rows, col_tiles * LANE
    )


@functools.partial(
    jax.jit,
    static_argnames=("plan", "spill", "frac_bits", "acc_bits", "block_rows",
                     "col_tiles", "tail_rows", "needs_wrap", "interpret"),
)
def _fir2d_mxu_padded(
    x_ext,  # (B_pad + TAIL_R, W_out_pad + 128) uint8
    a,      # (P, K, 128) int8
    bias,   # (1, 1) int32
    plan: tuple,
    spill: int,
    frac_bits: int,
    acc_bits: int,
    block_rows: int,
    col_tiles: int,
    tail_rows: int,
    needs_wrap: bool,
    interpret: bool,
):
    rows_ext, w_in = x_ext.shape
    w_out = w_in - LANE
    b_pad = rows_ext - tail_rows
    depth = a.shape[0]
    k_width = a.shape[1]
    grid = (b_pad // block_rows, w_out // (col_tiles * LANE))
    blocks_per_tail = block_rows // tail_rows

    in_specs = [
        pl.BlockSpec((1, 1), lambda r, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((depth, k_width, LANE), lambda r, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, col_tiles * LANE), lambda r, t: (r, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, LANE),
                     lambda r, t: (r, t * col_tiles + col_tiles),
                     memory_space=pltpu.VMEM),
        # Row tail: first TAIL_R rows of the NEXT row block, addressed in
        # TAIL_R-row block units of the same padded array.
        pl.BlockSpec((tail_rows, col_tiles * LANE),
                     lambda r, t: ((r + 1) * blocks_per_tail, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tail_rows, LANE),
                     lambda r, t: ((r + 1) * blocks_per_tail,
                                   t * col_tiles + col_tiles),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _fir2d_mxu_kernel,
        plan=plan,
        col_tiles=col_tiles,
        spill=spill,
        frac_bits=frac_bits,
        acc_bits=acc_bits,
        needs_wrap=needs_wrap,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_rows, col_tiles * LANE), lambda r, t: (r, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, w_out), jnp.uint8),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(bias, a, x_ext, x_ext, x_ext, x_ext)


def fir2d_fixed_mxu(
    x_u8,
    h,
    qformat: QFormat = QFormat(),
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    col_tiles: int = DEFAULT_COL_TILES,
    interpret: bool | None = None,
) -> jax.Array:
    """Bit-exact fixed-point dense 2-D FIR on the MXU over an (H, W) image."""
    if not qformat.tpu_native:
        raise ValueError(
            f"acc_bits={qformat.acc_bits} > 32 is not representable in the "
            "int32 TPU sim path; use fir2d_fixed_golden."
        )
    h_fixed = qformat.quantize_coeffs(np.asarray(h)).astype(np.int64)
    taps_r, taps_c = h_fixed.shape
    center_r, center_c = taps_r // 2, taps_c // 2

    a, plan, k_width = build_band_matrices_2d(h_fixed)
    spill = k_width - LANE

    tail_rows = _round_up(max(taps_r - 1, 1), 8)
    if block_rows % tail_rows:
        block_rows = _round_up(block_rows, tail_rows)

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
    rows, cols = x_u8.shape
    b_pad = _round_up(max(rows, 1), block_rows)
    n_pad = _round_up(max(cols, 1), col_tiles * LANE)
    top = taps_r - 1 - center_r
    left = taps_c - 1 - center_c
    x_ext = jnp.pad(
        x_u8,
        (
            (top, b_pad - rows - top + tail_rows),
            (left, n_pad + LANE - left - cols),
        ),
    )
    out = _fir2d_mxu_padded(
        x_ext,
        jnp.asarray(a),
        jnp.asarray(bias),
        plan,
        spill,
        qformat.frac_bits,
        qformat.acc_bits,
        block_rows,
        col_tiles,
        tail_rows,
        needs_wrap,
        (jax.default_backend() != "tpu") if interpret is None else interpret,
    )
    return out[:rows, :cols]
