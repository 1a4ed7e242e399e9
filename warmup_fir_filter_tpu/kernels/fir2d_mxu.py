"""MXU Pallas kernel: bit-exact fixed-point dense 2-D FIR.

Extends the 1-D band-matrix formulation (``fir_mxu.py``) to dense
(Lr × Lc) kernels: the column dimension uses the same signed-base-256
banded int8 matmuls per tap-row, and the row dimension is realized with
**static row-shifted views** of the program's input block.

Layout contract (r2 full-row redesign, 5× the r1 kernel: 21.8 → 110 Gsps)
--------------------------------------------------------------------------
The kernel is shape-preserving over a **padded frame**: a
``(Hp, Wp)`` uint8 buffer whose image core sits at rows
``[T0, T0 + H)`` and cols ``[128, 128 + W)`` with zeros outside
(``T0 = roundup(Lr-1, 8)``; one 128-lane pad tile each side).  Each
program owns ``BR`` complete frame rows; the ``Lr - 1`` row halo rides
two small extra operands (the trailing ``T0`` rows of the previous
block and the leading ``T0`` of the next, clamped at the frame edges —
clamp garbage only ever reaches rows the row-mask zeroes).  All column
windows are in-register slices: out tile ``c`` reads frame cols
``[c·128 - e_c, c·128 - e_c + 128 + Lc - 1)`` (``e_c = Lc-1-Lc//2``),
one ``(BR, K)·(K, 128)`` int8 dot per (tap-row × digit).  The pad
border is re-zeroed on output (iota row mask + zero col tiles), so the
frame layout is a **fixed point of the kernel**: filtered frames can be
fed straight back in — streaming never re-pads.

The per-lane-tile dots replace the r1 kernel's flattened
``(BR·C, 128)`` windows: each flatten was a full VMEM relayout pass,
and the 4-side halo operands (col tail + corners) are gone with them.

Chaining without the XLA copy tax: an unaliased custom call inside a
loop pays a full-frame copy per iteration (see ``fir_mxu.py``).  The
2-D kernel cannot alias its *input* in place — output rows depend on
the previous block's already-overwritten tail — so it takes an optional
``scratch`` frame instead and aliases **scratch → output**; chained
callers pass a dead buffer (e.g. the previous iteration's input) and
XLA donates it, keeping loops copy-free (verified in HLO; see
``bench_2d.py``).

Output pixel (i, n) accumulates tap-row ``kr`` through the static
row-slice ``[T0 + i + Lr//2 - kr, … + BR)`` of the head|body|tail
concat, through the 1-D column band machinery built from
``h_fixed[kr, :]``.  Everything funnels into one int32 accumulator and
one epilogue, so the result is bit-identical to
``ops/fir2d.py::fir2d_fixed_golden``.
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


def _fir2d_fullrow_kernel(
    bias_ref,    # (1, 1) int32 SMEM
    a_ref,       # (P, K, 128) int8 band planes (common-K padded)
    head_ref,    # (T0, Wp) uint8: last T0 rows of the previous block
    body_ref,    # (BR, Wp) uint8: this block's frame rows
    tail_ref,    # (T0, Wp) uint8: first T0 rows of the next block
    *rest,       # [scratch_ref] if aliased, then o_ref
    plan: tuple[tuple[int, int, int], ...],
    e_c: int,
    k_eff: int,
    t0: int,
    core_h: int,
    core_w: int,
    frac_bits: int,
    acc_bits: int,
    needs_wrap: bool,
):
    o_ref = rest[-1]
    bias = bias_ref[0, 0]
    r = pl.program_id(0)
    block_rows, wp = body_ref.shape
    w_tiles = wp // LANE

    def _rebias(u8):
        return pltpu.bitcast(u8 ^ jnp.uint8(0x80), jnp.int8)

    x_full = jnp.concatenate(
        [_rebias(head_ref[:]), _rebias(body_ref[:]), _rebias(tail_ref[:])],
        axis=0,
    )  # (T0 + BR + T0, Wp)

    # Pad-row mask: frame rows outside [t0, t0 + core_h) are forced to
    # zero so the padded frame stays a fixed point of the kernel.
    row_global = r * block_rows + jax.lax.broadcasted_iota(
        jnp.int32, (block_rows, LANE), 0
    )
    core_row = (row_global >= t0) & (row_global < t0 + core_h)

    zero_tile = jnp.zeros((block_rows, LANE), jnp.uint8)
    o_ref[:, :LANE] = zero_tile
    o_ref[:, (w_tiles - 1) * LANE :] = zero_tile

    # Row-shifted full-width views, shared across column tiles.
    shifted = {}
    for row_shift, _, _ in plan:
        if row_shift not in shifted:
            shifted[row_shift] = x_full[row_shift : row_shift + block_rows, :]

    for c in range(1, w_tiles - 1):
        base = c * LANE - e_c
        acc = jnp.full((block_rows, LANE), bias, jnp.int32)
        for row_shift, b, plane in plan:
            window = shifted[row_shift][:, base : base + k_eff]
            prod = jnp.dot(window, a_ref[plane, :k_eff, :],
                           preferred_element_type=jnp.int32)
            acc = acc + (prod << b if b else prod)

        if needs_wrap:
            if acc_bits < 32:
                shift = 32 - acc_bits
                acc = (acc << shift) >> shift
            low = acc & ((1 << frac_bits) - 1)
            carry = (low + (1 << (frac_bits - 1))) >> frac_bits
            final = (acc >> frac_bits) + carry
        else:
            final = acc >> frac_bits

        mask = core_row
        # Partial last core tile: zero the lane-pad spill cols beyond
        # core_w so chained applies see exactly the (core_h, core_w)
        # image (static per unrolled tile).
        in_tile_limit = LANE + core_w - c * LANE
        if 0 < in_tile_limit < LANE:
            col_idx = jax.lax.broadcasted_iota(
                jnp.int32, (block_rows, LANE), 1
            )
            mask = mask & (col_idx < in_tile_limit)
        final = jnp.where(mask, jnp.clip(final, 0, 255), 0)
        o_ref[:, c * LANE : (c + 1) * LANE] = final.astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("plan", "e_c", "k_eff", "t0", "core_h", "core_w",
                     "frac_bits", "acc_bits", "block_rows", "needs_wrap",
                     "aliased", "interpret"),
)
def _fir2d_fullrow(
    x_ext,    # (Hp, Wp) uint8 padded frame
    a,        # (P, K, 128) int8
    bias,     # (1, 1) int32
    scratch,  # (Hp, Wp) uint8 donatable frame, or None
    plan: tuple,
    e_c: int,
    k_eff: int,
    t0: int,
    core_h: int,
    core_w: int,
    frac_bits: int,
    acc_bits: int,
    block_rows: int,
    needs_wrap: bool,
    aliased: bool,
    interpret: bool,
):
    hp, wp = x_ext.shape
    bpt = block_rows // t0
    grid = (hp // block_rows,)
    row_spec = pl.BlockSpec((block_rows, wp), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    halo = lambda idx_fn: pl.BlockSpec(  # noqa: E731
        (t0, wp), idx_fn, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda r: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(a.shape, lambda r: (0, 0, 0), memory_space=pltpu.VMEM),
        # Head/tail clamp at the frame edges: the clamped garbage rows
        # only feed output rows the row-mask zeroes (pad rows).
        halo(lambda r: (jnp.maximum(r * bpt - 1, 0), 0)),
        row_spec,
        halo(lambda r: (jnp.minimum((r + 1) * bpt, hp // t0 - 1), 0)),
    ]
    args = [bias, a, x_ext, x_ext, x_ext]
    kwargs = {}
    if aliased:
        in_specs.append(row_spec)
        args.append(scratch)
        kwargs["input_output_aliases"] = {5: 0}
    kernel = functools.partial(
        _fir2d_fullrow_kernel,
        plan=plan, e_c=e_c, k_eff=k_eff, t0=t0, core_h=core_h,
        core_w=core_w, frac_bits=frac_bits, acc_bits=acc_bits,
        needs_wrap=needs_wrap,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.uint8),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        **kwargs,
    )(*args)


def _quantize_2d(h, qformat: QFormat):
    h_fixed = qformat.quantize_coeffs(np.asarray(h)).astype(np.int64)
    if h_fixed.ndim != 2:
        raise ValueError(f"2-D FIR expects a 2-D kernel, got {h_fixed.shape}")
    a, plan, k_width = build_band_matrices_2d(h_fixed)
    worst = 255 * int(np.abs(h_fixed).sum()) + (1 << (qformat.frac_bits - 1))
    needs_wrap = worst >= (1 << (qformat.acc_bits - 1))
    bias_val = 128 * int(h_fixed.sum())
    if not needs_wrap:
        bias_val += 1 << (qformat.frac_bits - 1)
    bias_val &= 0xFFFFFFFF
    if bias_val >= 1 << 31:
        bias_val -= 1 << 32
    return h_fixed, a, plan, k_width, needs_wrap, np.asarray([[bias_val]],
                                                             np.int32)


def frame_geometry(
    h_img: int, w_img: int, taps_r: int, *, block_rows: int | None = None
) -> tuple[int, int, int, int]:
    """Padded-frame geometry ``(t0, hp, wp, block_rows)`` for an image.

    Core sits at rows ``[t0, t0 + h_img)``, cols ``[128, 128 + w_img)``.
    """
    t0 = _round_up(max(taps_r - 1, 1), 8)
    center_r = taps_r // 2
    wp = 2 * LANE + _round_up(max(w_img, 1), LANE)
    if block_rows is None:
        block_rows = max(t0, _round_up(2 * 1024 * 1024 // wp, t0))
    else:
        block_rows = _round_up(block_rows, t0)
    hp = _round_up(t0 + h_img + center_r, block_rows)
    return t0, hp, wp, block_rows


def pad_frame(x_u8, taps_r: int, *, block_rows: int | None = None):
    """Embed an (H, W) image into the kernel's padded-frame layout."""
    x_u8 = jnp.asarray(x_u8, dtype=jnp.uint8)
    h_img, w_img = x_u8.shape
    t0, hp, wp, block_rows = frame_geometry(h_img, w_img, taps_r,
                                            block_rows=block_rows)
    x_ext = jnp.pad(
        x_u8, ((t0, hp - t0 - h_img), (LANE, wp - LANE - w_img))
    )
    return x_ext, (t0, h_img, w_img, block_rows)


def fir2d_fixed_frame(
    x_ext,
    h,
    qformat: QFormat = QFormat(),
    *,
    core: tuple[int, int, int],
    block_rows: int | None = None,
    scratch=None,
    interpret: bool | None = None,
) -> jax.Array:
    """Shape-preserving fixed 2-D FIR over a padded frame (streaming API).

    ``x_ext`` is an (Hp, Wp) frame from :func:`pad_frame`;
    ``core = (t0, h_img, w_img)`` locates the image.  The output is a
    valid frame again (pad border and lane-spill cols re-zeroed), so
    chained applies compute exactly repeated same-mode filtering of the
    (h_img, w_img) image without re-padding.  Pass a dead same-shape
    ``scratch`` frame to alias it with the output — chained callers stay
    free of the XLA per-iteration copy (``fir_mxu.py`` module
    docstring).
    """
    h_fixed, a, plan, k_width, needs_wrap, bias = _quantize_2d(h, qformat)
    if not qformat.tpu_native:
        raise ValueError(
            f"acc_bits={qformat.acc_bits} > 32 is not representable in the "
            "int32 TPU sim path; use fir2d_fixed_golden."
        )
    taps_r, taps_c = h_fixed.shape
    if taps_c > LANE + 1:
        raise ValueError(
            f"2-D kernel supports up to {LANE + 1} column taps, got {taps_c}."
        )
    t0, core_h, core_w = core
    e_c = taps_c - 1 - taps_c // 2
    e_r = taps_r - 1 - taps_r // 2
    # build_band_matrices_2d plans row shifts as Lr-1-kr (top-pad = Lr-1
    # convention); the frame kernel's concat offset is t0 with same-mode
    # center alignment, so shift = t0 - e_r + (Lr-1-kr).
    plan = tuple((t0 - e_r + rs, b, p) for rs, b, p in plan)
    hp, wp = x_ext.shape
    if block_rows is None:
        block_rows = frame_geometry(core_h, wp - 2 * LANE, taps_r)[3]
    block_rows = min(_round_up(block_rows, t0), hp)
    if hp % block_rows or wp % LANE or block_rows % t0:
        raise ValueError(
            f"Frame ({hp}, {wp}) incompatible with block_rows={block_rows}, "
            f"t0={t0}; build frames with pad_frame()/frame_geometry()."
        )
    return _fir2d_fullrow(
        x_ext,
        jnp.asarray(a),
        jnp.asarray(bias),
        scratch,
        plan,
        e_c,
        k_width,
        t0,
        core_h,
        core_w,
        qformat.frac_bits,
        qformat.acc_bits,
        block_rows,
        needs_wrap,
        scratch is not None,
        (jax.default_backend() != "tpu") if interpret is None else interpret,
    )


def fir2d_fixed_mxu(
    x_u8,
    h,
    qformat: QFormat = QFormat(),
    *,
    block_rows: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Bit-exact fixed-point dense 2-D FIR on the MXU over an (H, W) image.

    Single-shot convenience over the padded-frame kernel: embeds the
    image (:func:`pad_frame`), filters, crops the core.  Streaming /
    chained callers should hold the frame layout and call
    :func:`fir2d_fixed_frame` directly — it is shape-preserving and
    supports copy-free scratch aliasing.
    """
    taps_r = int(np.asarray(h).shape[0])
    x_ext, (t0, h_img, w_img, block_rows) = pad_frame(
        x_u8, taps_r, block_rows=block_rows
    )
    out = fir2d_fixed_frame(
        x_ext, h, qformat, core=(t0, h_img, w_img), block_rows=block_rows,
        interpret=interpret,
    )
    return out[t0 : t0 + h_img, LANE : LANE + w_img]
