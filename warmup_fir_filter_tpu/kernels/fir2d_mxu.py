"""MXU Pallas kernel: bit-exact fixed-point dense 2-D FIR.

Extends the 1-D band-matrix formulation (``fir_mxu.py``) to dense
(Lr × Lc) kernels: the column dimension uses per-(tap-row × digit)
**tri-tile** signed-base-256 int8 matmuls, and the row dimension is
realized with static row-shifted views of the program's input block.

Layout contract (r2 full-row design, kept)
------------------------------------------
The kernel is shape-preserving over a **padded frame**: a ``(Hp, Wp)``
uint8 buffer whose image core sits at rows ``[T0, T0 + H)`` and cols
``[128, 128 + W)`` with zeros outside (``T0 = roundup(Lr-1, 8)``; one
128-lane pad tile each side).  Each program owns ``BR`` complete frame
rows; the ``Lr - 1`` row halo rides two small extra operands (the
trailing ``T0`` rows of the previous block and the leading ``T0`` of
the next, clamped at the frame edges — clamp garbage only ever reaches
rows the row-mask zeroes).  The pad border is re-zeroed on output
(iota row mask + zero col tiles), so the frame layout is a **fixed
point of the kernel**: filtered frames can be fed straight back in —
streaming never re-pads.

Column formulation (r3 redesign: 110 → ~160 Gsps for 5×5)
---------------------------------------------------------
The r2 kernel computed each (tap-row × digit) plane as ONE dot against
a lane-MISALIGNED ``K = 128 + Lc - 1`` window.  On-chip attribution
probes (sharpen5, 6 planes, v5e) showed that window is the whole gap
to the 1-D kernel:

=====================  =========  =====================================
probe                  Gsps       meaning
=====================  =========  =====================================
base (K=132, offset)     110      r2 production formulation
K=128, offset            159      one MXU weight tile/dot, not two
K=128, lane-ALIGNED      203      no operand realignment either
1 plane (any K)          ~245     per-plane overhead wall
halos/shifts/concat      free     base == no-halo "pure" variant
=====================  =========  =====================================

Two bit-exact kernels exploit this:

- **The plain-frame kernel** (general path) uses the 1-D kernel's
  tri-tile split per plane: one lane-aligned ``(BR,128)·(128,128)``
  main dot plus two side dots trimmed to ``K = left`` / ``center``
  rows.  This lifts the column-tap limit from the r2 two-tile 129 to
  the tri-tile **257** (``fir_mxu.MAX_TAPS``), since the frame's
  one-tile side pad covers ``left, center ≤ 128``.  At small Lc the
  per-dot cost makes it SLOWER than the r2 two-dot form (84 vs 110
  Gsps at 5×5) — but small Lc dispatches to the overlapped frame:
- **The overlapped-frame kernel** (fast path, ``Lc - 1 ≤ 96``) changes
  the frame layout so each plane is ONE aligned dot — see the
  overlapped-frame section below.  Measured 5×5: 110 → 156.5 Gsps
  recorded (BENCH_2D_r03.json; run-to-run 156-168 through the axon
  tunnel).

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
concat, through the 1-D tri-tile column machinery built from
``h_fixed[kr, :]``.  Everything funnels into one int32 accumulator and
one epilogue, so the result is bit-identical to
``ops/fir2d.py::fir2d_fixed_golden`` (the 2-D extension of the golden
contract, ``/root/reference`` ``fir_1d_fixed_ref.py:95-128``).
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
    MAX_TAPS,
    factor_pow2,
    signed_base256_digits,
)
from warmup_fir_filter_tpu.ops.qformat import QFormat

def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def build_tile_band_planes_2d(h_fixed: np.ndarray):
    """Per-(tap-row × digit) tri-tile band planes.

    Returns ``(a_prev, a_cur, a_next, plan, left, center)``:

    - ``a_cur``  is ``(P, 128, 128)`` int8 — lane-aligned main bands,
      ``a_cur[p][j, i] = digit_p[i + center - j]``;
    - ``a_prev`` is ``(P, max(left, 1), 128)`` — the band's reach into
      the previous lane tile (its last ``left`` columns);
    - ``a_next`` is ``(P, max(center, 1), 128)`` — the reach into the
      next tile (its first ``center`` columns);
    - ``plan`` is a static tuple of ``(row_shift, exponent, plane)``
      triples, ``row_shift = Lr - 1 - kr`` (top-pad convention; the
      frame caller rebases it), ``exponent`` the accumulation bit shift
      (``8·byte + row pow2`` from :func:`fir_mxu.factor_pow2`).

    ``left = Lc - 1 - Lc//2``, ``center = Lc//2`` — identical for every
    tap-row, so the three stacks share shapes.  All-zero rows cost
    nothing.  Column mapping matches the same-mode center alignment of
    ``fir2d_fixed_golden`` (out n reads x[n - kc + center]).

    A shifted-VPU-MAC fast path for single-nonzero digit planes was
    measured and REJECTED: on v5e the misaligned int8 slice + widen +
    int32 multiply costs more than the aligned (BR,128)·(128,128) dot it
    replaces (sharpen5 overlapped frame: 151.9 Gsps with the VPU tap vs
    157.4 with the plane on the MXU).
    """
    h_fixed = np.asarray(h_fixed, dtype=np.int64)
    taps_r, taps_c = h_fixed.shape
    if taps_c > MAX_TAPS:
        raise ValueError(
            f"2-D kernel supports up to {MAX_TAPS} column taps, got {taps_c}."
        )
    center = taps_c // 2
    left = taps_c - 1 - center
    i_idx = np.arange(LANE)[None, :]

    def band(rows: int, offset: int, digit: np.ndarray) -> np.ndarray:
        j_idx = np.arange(max(rows, 1))[:, None]
        k = i_idx + center + offset - j_idx
        valid = (k >= 0) & (k < taps_c)
        a = np.zeros((max(rows, 1), LANE), np.int8)
        a[valid] = digit[k[valid]]
        return a

    prev_planes: list[np.ndarray] = []
    cur_planes: list[np.ndarray] = []
    next_planes: list[np.ndarray] = []
    plan: list[tuple[int, int, int]] = []
    for kr in range(taps_r):
        row = h_fixed[kr]
        if not np.any(row):
            continue
        reduced, pow2 = factor_pow2(row)
        digits = signed_base256_digits(reduced)
        row_shift = taps_r - 1 - kr
        for b in range(digits.shape[0]):
            digit = digits[b]
            if not np.any(digit):
                continue
            plan.append((row_shift, 8 * b + pow2, len(cur_planes)))
            prev_planes.append(band(left, left, digit))
            cur_planes.append(band(LANE, 0, digit))
            next_planes.append(band(center, -LANE, digit))
    if not cur_planes:  # all-zero filter
        prev_planes.append(np.zeros((max(left, 1), LANE), np.int8))
        cur_planes.append(np.zeros((LANE, LANE), np.int8))
        next_planes.append(np.zeros((max(center, 1), LANE), np.int8))
    return (
        np.stack(prev_planes),
        np.stack(cur_planes),
        np.stack(next_planes),
        tuple(plan),
        left,
        center,
    )


def _fir2d_fullrow_kernel(
    bias_ref,    # (1, 1) int32 SMEM
    a_prev_ref,  # (P, max(left,1), 128) int8 side band planes
    a_cur_ref,   # (P, 128, 128) int8 lane-aligned main band planes
    a_next_ref,  # (P, max(center,1), 128) int8 side band planes
    head_ref,    # (T0, Wp) uint8: last T0 rows of the previous block
    body_ref,    # (BR, Wp) uint8: this block's frame rows
    tail_ref,    # (T0, Wp) uint8: first T0 rows of the next block
    *rest,       # [scratch_ref] if aliased, then o_ref
    plan: tuple[tuple[int, int, int], ...],
    left: int,
    center: int,
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

    # Row-shifted full-width views, shared across column tiles (probes:
    # the shifts are free — they fold into the dots' operand addressing).
    shifted = {}
    for row_shift, _, _ in plan:
        if row_shift not in shifted:
            shifted[row_shift] = x_full[row_shift : row_shift + block_rows, :]

    for c in range(1, w_tiles - 1):
        lo = c * LANE
        acc = jnp.full((block_rows, LANE), bias, jnp.int32)
        for row_shift, b, plane in plan:
            xs = shifted[row_shift]
            # Lane-aligned main dot (one MXU weight tile) + two tiny
            # side dots — the side slices land in the frame's pad tiles
            # at the edge column tiles, which hold u8 zeros the bias
            # constant restores exactly.
            prod = jnp.dot(xs[:, lo : lo + LANE], a_cur_ref[plane],
                           preferred_element_type=jnp.int32)
            if left:
                prod = prod + jnp.dot(xs[:, lo - left : lo],
                                      a_prev_ref[plane],
                                      preferred_element_type=jnp.int32)
            if center:
                prod = prod + jnp.dot(xs[:, lo + LANE : lo + LANE + center],
                                      a_next_ref[plane],
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
    static_argnames=("plan", "left", "center", "t0", "core_h",
                     "core_w", "frac_bits", "acc_bits", "block_rows",
                     "needs_wrap", "aliased", "interpret"),
)
def _fir2d_fullrow(
    x_ext,    # (Hp, Wp) uint8 padded frame
    a_prev,   # (P, max(left,1), 128) int8
    a_cur,    # (P, 128, 128) int8
    a_next,   # (P, max(center,1), 128) int8
    bias,     # (1, 1) int32
    scratch,  # (Hp, Wp) uint8 donatable frame, or None
    plan: tuple,
    left: int,
    center: int,
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
    plane_spec = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda r: (0, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda r: (0, 0), memory_space=pltpu.SMEM),
        plane_spec(a_prev),
        plane_spec(a_cur),
        plane_spec(a_next),
        # Head/tail clamp at the frame edges: the clamped garbage rows
        # only feed output rows the row-mask zeroes (pad rows).
        halo(lambda r: (jnp.maximum(r * bpt - 1, 0), 0)),
        row_spec,
        halo(lambda r: (jnp.minimum((r + 1) * bpt, hp // t0 - 1), 0)),
    ]
    args = [bias, a_prev, a_cur, a_next, x_ext, x_ext, x_ext]
    kwargs = {}
    if aliased:
        in_specs.append(row_spec)
        args.append(scratch)
        kwargs["input_output_aliases"] = {7: 0}
    kernel = functools.partial(
        _fir2d_fullrow_kernel,
        plan=plan, left=left, center=center, t0=t0,
        core_h=core_h, core_w=core_w, frac_bits=frac_bits,
        acc_bits=acc_bits, needs_wrap=needs_wrap,
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


def _top_digit_round(h_fixed: np.ndarray) -> np.ndarray:
    """Round each tap row to its top signed-base-256 digit (r5).

    Rows already fitting one digit (after the power-of-two factor) are
    EXACT and unchanged; multi-digit rows are rounded to the nearest
    top-digit multiple, trading bit-exactness for one fewer MXU plane
    per such row (relative coefficient error ≤ 2⁻⁸·√·· per row —
    SNR-gated like the chain's bf16 mode, never silently dispatched).
    """
    out = np.asarray(h_fixed, np.int64).copy()
    for kr in range(out.shape[0]):
        row = out[kr]
        if not np.any(row):
            continue
        reduced, pow2 = factor_pow2(row)
        d = signed_base256_digits(reduced).shape[0]
        if d <= 1:
            continue
        q = 256 ** (d - 1)
        top = np.clip(np.round(reduced / q), -128, 127).astype(np.int64)
        out[kr] = (top * q) << pow2
    return out


def _quantize_2d(h, qformat: QFormat, digit_mode: str = "exact"):
    h_fixed = qformat.quantize_coeffs(np.asarray(h)).astype(np.int64)
    if h_fixed.ndim != 2:
        raise ValueError(f"2-D FIR expects a 2-D kernel, got {h_fixed.shape}")
    if digit_mode == "top":
        h_fixed = _top_digit_round(h_fixed)
    elif digit_mode != "exact":
        raise ValueError(f"unknown digit_mode {digit_mode!r}")
    planes = build_tile_band_planes_2d(h_fixed)
    worst = 255 * int(np.abs(h_fixed).sum()) + (1 << (qformat.frac_bits - 1))
    needs_wrap = worst >= (1 << (qformat.acc_bits - 1))
    bias_val = 128 * int(h_fixed.sum())
    if not needs_wrap:
        bias_val += 1 << (qformat.frac_bits - 1)
    bias_val &= 0xFFFFFFFF
    if bias_val >= 1 << 31:
        bias_val -= 1 << 32
    return h_fixed, planes, needs_wrap, np.asarray([[bias_val]], np.int32)


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
    h_fixed, planes, needs_wrap, bias = _quantize_2d(h, qformat)
    a_prev, a_cur, a_next, plan, left, center = planes
    if not qformat.tpu_native:
        raise ValueError(
            f"acc_bits={qformat.acc_bits} > 32 is not representable in the "
            "int32 TPU sim path; use fir2d_fixed_golden."
        )
    taps_r, taps_c = h_fixed.shape
    t0, core_h, core_w = core
    e_r = taps_r - 1 - taps_r // 2
    # build_tile_band_planes_2d plans row shifts as Lr-1-kr (top-pad =
    # Lr-1 convention); the frame kernel's concat offset is t0 with
    # same-mode center alignment, so shift = t0 - e_r + (Lr-1-kr).
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
        jnp.asarray(a_prev),
        jnp.asarray(a_cur),
        jnp.asarray(a_next),
        jnp.asarray(bias),
        scratch,
        plan,
        left,
        center,
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


# ---------------------------------------------------------------------------
# Overlapped-frame kernel: ONE aligned MXU dot per digit plane.
#
# The r2 ablation (docs/architecture.md "2-D FIR roofline") established
# that every jnp.dot in the unrolled tile loop costs ~one full-depth MXU
# pass regardless of K, so dots/tile is the throughput metric: the
# plain-frame band kernel needs ≥2 dots per plane (main + band spill; the
# r2 K=132 dot is 2 passes, the r3 tri-tile is 3 dots) and tops out at
# ~110 Gsps for 6 planes.  The overlapped frame removes the spill
# entirely: adjacent 128-lane tiles DUPLICATE the Lc-1 boundary columns
# (tile c holds image cols [(c-1)·s - left, (c-1)·s + 128), stride
# s = 128 - (Lc-1)), so each tile's full band window is tile-resident and
# every plane is ONE lane-aligned (BR,128)·(128,128) dot.  Lanes
# [left, 128-center) of each accumulator are exact; the boundary lanes
# are patched from the neighbor tiles' accumulators with one u8 lane
# concat per tile (cheap VPU work), which also keeps the duplicated
# columns consistent — the overlapped frame is again a FIXED POINT of the
# kernel, so chained applies never re-stage.  Cost: 128/s ≈ +3% HBM
# traffic and tiles for 5×5.  Measured (sharpen5, 8192², v5e):
# plain-frame 110 Gsps → overlapped 160-168 Gsps (BENCH_2D_r03.json).
# The remaining gap to the 6-aligned-dot probe ceiling (203) is the
# boundary-patch assembly + pad masking (~1.2 dot-equivalents/tile);
# cheaper-looking alternatives measured WORSE: hoisted-u8 bitwise
# AND/OR gating 140, pl.when-gated stores 72, per-plane VPU taps for
# single-nonzero digit planes 152.
# ---------------------------------------------------------------------------

#: Maximum column overlap (Lc - 1) for the overlapped-frame layout.  At
#: o = 96 the stride drops to 32 (4× tiles/traffic); beyond that the
#: general tri-tile frame kernel wins.
OFRAME_MAX_OVERLAP = 96


def oframe_geometry(
    h_img: int, w_img: int, taps_r: int, taps_c: int, *,
    block_rows: int | None = None,
) -> tuple[int, int, int, int, int]:
    """Overlapped-frame geometry ``(t0, hp, wp, block_rows, stride)``.

    Rows as :func:`frame_geometry`; columns use ``interior =
    ceil(w_img / stride)`` data tiles plus one zero pad tile each side.
    Interior tile ``c`` (1-based) holds image cols
    ``[(c-1)·stride - left, (c-1)·stride + 128)``.
    """
    overlap = taps_c - 1
    if not 0 < overlap <= OFRAME_MAX_OVERLAP:
        raise ValueError(
            f"overlapped frame needs 1 < taps_c <= {OFRAME_MAX_OVERLAP + 1}, "
            f"got {taps_c}."
        )
    stride = LANE - overlap
    t0 = _round_up(max(taps_r - 1, 1), 8)
    center_r = taps_r // 2
    interior = -(-max(w_img, 1) // stride)
    wp = (interior + 2) * LANE
    if block_rows is None:
        block_rows = max(t0, _round_up(2 * 1024 * 1024 // wp, t0))
    else:
        block_rows = _round_up(block_rows, t0)
    hp = _round_up(t0 + h_img + center_r, block_rows)
    return t0, hp, wp, block_rows, stride


def pad_frame_overlap(
    x_u8, taps_r: int, taps_c: int, *, block_rows: int | None = None
):
    """Embed an (H, W) image into the overlapped-frame layout."""
    x_u8 = jnp.asarray(x_u8, dtype=jnp.uint8)
    h_img, w_img = x_u8.shape
    t0, hp, wp, block_rows, stride = oframe_geometry(
        h_img, w_img, taps_r, taps_c, block_rows=block_rows
    )
    center = taps_c // 2
    left = taps_c - 1 - center
    interior = wp // LANE - 2
    # Zero-pad the image row block and the logical column range
    # [-left, interior·stride + center), then materialize the interior
    # tiles as overlapping 128-col windows.
    xp = jnp.pad(
        x_u8,
        ((t0, hp - t0 - h_img),
         (left, interior * stride + center - w_img)),
    )
    zeros = jnp.zeros((hp, LANE), jnp.uint8)
    tiles = [zeros]
    tiles += [xp[:, c * stride : c * stride + LANE] for c in range(interior)]
    tiles.append(zeros)
    return jnp.concatenate(tiles, axis=1), (t0, h_img, w_img, block_rows)


def _fir2d_oframe_kernel(
    bias_ref,    # (1, 1) int32 SMEM
    a_ref,       # (P, 128, 128) int8 lane-aligned main band planes
    head_ref,    # (T0, Wp) uint8: last T0 rows of the previous block
    body_ref,    # (BR, Wp) uint8: this block's frame rows
    tail_ref,    # (T0, Wp) uint8: first T0 rows of the next block
    *rest,       # [scratch_ref] if aliased, then o_ref
    plan: tuple[tuple[int, int, int], ...],
    left: int,
    center: int,
    stride: int,
    t0: int,
    core_h: int,
    core_w: int,
    frac_bits: int,
    acc_bits: int,
    needs_wrap: bool,
    ablate: str = "default",
):
    o_ref = rest[-1]
    bias = bias_ref[0, 0]
    r = pl.program_id(0)
    block_rows, wp = body_ref.shape
    w_tiles = wp // LANE

    def _rebias(u8):
        if ablate == "no_rebias":  # measurement-only: WRONG values —
            # isolates the xor pass cost (bitcast alone is free)
            return pltpu.bitcast(u8, jnp.int8)
        return pltpu.bitcast(u8 ^ jnp.uint8(0x80), jnp.int8)

    x_full = jnp.concatenate(
        [_rebias(head_ref[:]), _rebias(body_ref[:]), _rebias(tail_ref[:])],
        axis=0,
    )

    row_global = r * block_rows + jax.lax.broadcasted_iota(
        jnp.int32, (block_rows, LANE), 0
    )
    core_row = (row_global >= t0) & (row_global < t0 + core_h)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 1)
    # Ablation switches (r4, kept for measurement): "no_patch" /
    # "no_mask" / "pure" produce WRONG borders/boundaries by design,
    # isolating the cost of each non-dot stage on real hardware;
    # "deferred_border" and "acc_patch" are CORRECT alternatives that
    # measured perf-neutral (docs/roofline.md "2-D ablation ladder").
    do_patch = ablate not in ("no_patch", "pure")
    do_mask = ablate not in ("no_mask", "pure")
    roll = lambda v, sh: jnp.roll(v, sh, axis=1)  # noqa: E731
    # Masking stays per-tile jnp.where on in-loop predicates: measured
    # 160-168 Gsps vs 140 for hoisted-u8 bitwise AND/OR gating and 72
    # for pl.when-gated stores; hoisted i1 predicates don't compile at
    # all (Mosaic "Invalid relayout ... vector<...xi1>" between the i32
    # (8,128) and u8 (32,128) tilings).

    zero_tile = jnp.zeros((block_rows, LANE), jnp.uint8)
    o_ref[:, :LANE] = zero_tile
    o_ref[:, (w_tiles - 1) * LANE :] = zero_tile

    shifted = {}
    for row_shift, _, _ in plan:
        if row_shift not in shifted:
            shifted[row_shift] = x_full[row_shift : row_shift + block_rows, :]

    def tile_acc(c):
        """Raw int32 accumulator for tile c: one aligned dot per plane
        (lanes [left, 128-center) exact; boundary lanes partial —
        patched from the neighbor tiles' accumulators below)."""
        lo = c * LANE
        acc = jnp.full((block_rows, LANE), bias, jnp.int32)
        for row_shift, b, plane in plan:
            prod = jnp.dot(shifted[row_shift][:, lo : lo + LANE],
                           a_ref[plane], preferred_element_type=jnp.int32)
            acc = acc + (prod << b if b else prod)
        return acc

    def epilogue(acc):
        if ablate == "raw_store":  # measurement-only: WRONG values —
            # isolates the shift/clip/cast epilogue cost
            return acc.astype(jnp.uint8)
        if needs_wrap:
            if acc_bits < 32:
                shift = 32 - acc_bits
                acc = (acc << shift) >> shift
            low = acc & ((1 << frac_bits) - 1)
            carry = (low + (1 << (frac_bits - 1))) >> frac_bits
            final = (acc >> frac_bits) + carry
        else:
            final = acc >> frac_bits
        return jnp.clip(final, 0, 255).astype(jnp.uint8)

    def tile_u8(c):
        return epilogue(tile_acc(c))

    # One-tile lookahead: tile c's last `center` lanes come from tile
    # c+1's accumulator (and its first `left` lanes from tile c-1's),
    # so three epilogued tiles are live at a time.  The patches leave
    # `cur` unshifted — only the neighbors are lane-rolled, and both
    # patches merge through ONE select against the hoisted boundary
    # predicate.
    if ablate == "acc_patch":
        # Patch the int32 accumulators instead of the epilogued u8 tiles
        # (elementwise epilogue ⇒ identical results), using the native
        # 32-bit lane rotate; one epilogue per assembled tile.
        zero_acc = jnp.zeros((block_rows, LANE), jnp.int32)
        prev = zero_acc
        cur = tile_acc(1) if w_tiles > 2 else zero_acc
        for c in range(1, w_tiles - 1):
            nxt = tile_acc(c + 1) if c + 1 < w_tiles - 1 else zero_acc
            assembled = cur
            if left:
                assembled = jnp.where(
                    col_idx < left,
                    pltpu.roll(prev, (-stride) % LANE, 1), assembled)
            if center:
                assembled = jnp.where(
                    col_idx >= LANE - center,
                    pltpu.roll(nxt, stride % LANE, 1), assembled)
            out_u8 = epilogue(assembled)
            base = (c - 1) * stride - left
            mask = core_row
            if base < 0:
                mask = mask & (col_idx >= -base)
            if base + LANE > core_w:
                mask = mask & (col_idx < core_w - base)
            if do_mask:
                out_u8 = jnp.where(mask, out_u8, 0)
            o_ref[:, c * LANE : (c + 1) * LANE] = out_u8
            prev, cur = cur, nxt
        return

    if ablate in ("default", "epi4", "epi16", "epi64"):
        # r5 DEFAULT: batch the epilogue + mask + store over groups of
        # 4 assembled tiles (4× wider VPU ops).  The r5 fixed-cost
        # probe measured the per-tile epilogue (shift+clip+cast) at
        # ~12% of kernel time; batching recovers the per-op overhead
        # share (sharpen5 156.8 → 161.3, gauss5 171.6 → 174.5 Gsps
        # medians, interleaved) and is bit-exact (same ops, wider).
        # ablate="unbatched" keeps the r3/r4 per-tile form.
        group = {"epi16": 16, "epi64": 64}.get(ablate, 4)
        zero_acc = jnp.zeros((block_rows, LANE), jnp.int32)
        prev = zero_acc
        cur = tile_acc(1) if w_tiles > 2 else zero_acc
        buf: list = []
        c0 = 1
        for c in range(1, w_tiles - 1):
            nxt = tile_acc(c + 1) if c + 1 < w_tiles - 1 else zero_acc
            assembled = cur
            if left:
                assembled = jnp.where(
                    col_idx < left,
                    pltpu.roll(prev, (-stride) % LANE, 1), assembled)
            if center:
                assembled = jnp.where(
                    col_idx >= LANE - center,
                    pltpu.roll(nxt, stride % LANE, 1), assembled)
            base = (c - 1) * stride - left
            mask = core_row
            if base < 0:
                mask = mask & (col_idx >= -base)
            if base + LANE > core_w:
                mask = mask & (col_idx < core_w - base)
            buf.append((assembled, mask))
            if len(buf) == group or c == w_tiles - 2:
                cat = jnp.concatenate([a for a, _ in buf], axis=1)
                mcat = jnp.concatenate([m for _, m in buf], axis=1)
                u8 = jnp.where(mcat, epilogue(cat), 0)
                o_ref[:, c0 * LANE : (c0 + len(buf)) * LANE] = u8
                c0 += len(buf)
                buf = []
            prev, cur = cur, nxt
        return

    in_loop_mask = ablate != "deferred_border"
    prev = zero_tile
    cur = tile_u8(1) if w_tiles > 2 else zero_tile
    for c in range(1, w_tiles - 1):
        nxt = tile_u8(c + 1) if c + 1 < w_tiles - 1 else zero_tile
        assembled = cur
        if do_patch and left:
            assembled = jnp.where(col_idx < left,
                                  roll(prev, -stride), assembled)
        if do_patch and center:
            assembled = jnp.where(col_idx >= LANE - center,
                                  roll(nxt, stride), assembled)
        # Logical-column mask: lane i of tile c is image col base + i.
        # The in-loop row mask is the r3 default and measured equal to
        # the "deferred_border" form (per-program border fix) in the r4
        # interleaved A/B — both ~162-167 Gsps medians at 5×5
        # (docs/roofline.md "2-D ablation ladder"); the simpler in-loop
        # form stays default.
        base = (c - 1) * stride - left
        if do_mask:
            mask = core_row if in_loop_mask else None
            if base < 0:
                cm = col_idx >= -base
                mask = cm if mask is None else mask & cm
            if base + LANE > core_w:
                cm = col_idx < core_w - base
                mask = cm if mask is None else mask & cm
            if mask is not None:
                assembled = jnp.where(mask, assembled, 0)
        o_ref[:, c * LANE : (c + 1) * LANE] = assembled
        prev, cur = cur, nxt

    if do_mask and not in_loop_mask:
        # Deferred border fix ("deferred_border" ablation): only the
        # (at most two) programs whose row block touches the top/bottom
        # pad do any work here; interior programs skip both branches
        # entirely (a once-per-program pl.when, NOT the per-tile gating
        # the r3 ablation measured at 72 Gsps).
        @pl.when(r * block_rows < t0)
        def _zero_top():  # block_rows % t0 == 0 ⇒ the slice is in-block
            o_ref[:t0, :] = jnp.zeros((t0, wp), jnp.uint8)

        bot0 = t0 + core_h

        @pl.when((r + 1) * block_rows > bot0)
        def _zero_bottom():
            keep = r * block_rows + jax.lax.broadcasted_iota(
                jnp.int32, (block_rows, wp), 0) < bot0
            o_ref[:] = jnp.where(keep, o_ref[:], 0)


@functools.partial(
    jax.jit,
    static_argnames=("plan", "left", "center", "stride", "t0",
                     "core_h", "core_w", "frac_bits", "acc_bits",
                     "block_rows", "needs_wrap", "aliased", "interpret",
                     "ablate"),
)
def _fir2d_oframe(
    x_ext,    # (Hp, Wp) uint8 overlapped frame
    a_cur,    # (P, 128, 128) int8
    bias,     # (1, 1) int32
    scratch,  # (Hp, Wp) uint8 donatable frame, or None
    plan: tuple,
    left: int,
    center: int,
    stride: int,
    t0: int,
    core_h: int,
    core_w: int,
    frac_bits: int,
    acc_bits: int,
    block_rows: int,
    needs_wrap: bool,
    aliased: bool,
    interpret: bool,
    ablate: str = "default",
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
        pl.BlockSpec(a_cur.shape, lambda r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        halo(lambda r: (jnp.maximum(r * bpt - 1, 0), 0)),
        row_spec,
        halo(lambda r: (jnp.minimum((r + 1) * bpt, hp // t0 - 1), 0)),
    ]
    args = [bias, a_cur, x_ext, x_ext, x_ext]
    kwargs = {}
    if aliased:
        in_specs.append(row_spec)
        args.append(scratch)
        kwargs["input_output_aliases"] = {5: 0}
    kernel = functools.partial(
        _fir2d_oframe_kernel,
        plan=plan, left=left, center=center,
        stride=stride, t0=t0, core_h=core_h, core_w=core_w,
        frac_bits=frac_bits, acc_bits=acc_bits, needs_wrap=needs_wrap,
        ablate=ablate,
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


def fir2d_fixed_frame_overlap(
    x_ext,
    h,
    qformat: QFormat = QFormat(),
    *,
    core: tuple[int, int, int],
    block_rows: int | None = None,
    scratch=None,
    interpret: bool | None = None,
    ablate: str = "default",
    digit_mode: str = "exact",
) -> jax.Array:
    """Shape-preserving fixed 2-D FIR over an OVERLAPPED frame.

    Same streaming contract as :func:`fir2d_fixed_frame` (pad border
    re-zeroed, duplicated boundary columns kept consistent, optional
    scratch→output aliasing), on the :func:`pad_frame_overlap` layout —
    the fast path for ``taps_c - 1 ≤ OFRAME_MAX_OVERLAP``: one aligned
    MXU dot per digit plane (see the overlapped-frame section of the
    module docstring).
    """
    h_fixed, planes, needs_wrap, bias = _quantize_2d(h, qformat,
                                                     digit_mode)
    _, a_cur, _, plan, left, center = planes
    if not qformat.tpu_native:
        raise ValueError(
            f"acc_bits={qformat.acc_bits} > 32 is not representable in the "
            "int32 TPU sim path; use fir2d_fixed_golden."
        )
    taps_r, taps_c = h_fixed.shape
    overlap = taps_c - 1
    if not 0 < overlap <= OFRAME_MAX_OVERLAP:
        raise ValueError(
            f"overlapped frame needs 1 < taps_c <= {OFRAME_MAX_OVERLAP + 1}, "
            f"got {taps_c}; use fir2d_fixed_frame."
        )
    stride = LANE - overlap
    t0, core_h, core_w = core
    e_r = taps_r - 1 - taps_r // 2
    plan = tuple((t0 - e_r + rs, b, p) for rs, b, p in plan)
    hp, wp = x_ext.shape
    if block_rows is None:
        block_rows = oframe_geometry(core_h, core_w, taps_r, taps_c)[3]
    block_rows = min(_round_up(block_rows, t0), hp)
    interior = wp // LANE - 2
    if (hp % block_rows or wp % LANE or block_rows % t0
            or interior * stride < core_w):
        raise ValueError(
            f"Overlapped frame ({hp}, {wp}) incompatible with "
            f"block_rows={block_rows}, t0={t0}, stride={stride}; build "
            "frames with pad_frame_overlap()/oframe_geometry()."
        )
    return _fir2d_oframe(
        x_ext,
        jnp.asarray(a_cur),
        jnp.asarray(bias),
        scratch,
        plan,
        left,
        center,
        stride,
        t0,
        core_h,
        core_w,
        qformat.frac_bits,
        qformat.acc_bits,
        block_rows,
        needs_wrap,
        scratch is not None,
        (jax.default_backend() != "tpu") if interpret is None else interpret,
        ablate,
    )


def bf16_2d_exact(h_fixed: np.ndarray, qformat: QFormat) -> bool:
    """Whether the bf16 2-D path is PROVABLY bit-exact for this filter.

    Three sufficient conditions make every float op in
    :func:`fir2d_frame_overlap_bf16` exact integer arithmetic:

    1. every quantized coefficient is exactly bf16-representable
       (value's mantissa fits 8 bits — true for sharpen5 and gauss5);
    2. the worst-case accumulator ``255·Σ|h_fixed|`` stays below 2²⁴
       (f32 integer-exact range), so products and every partial sum
       are exact;
    3. no accumulator wraparound is required
       (``worst < 2^(acc_bits-1)``), since the float path cannot
       emulate two's-complement wrap.

    The epilogue ``floor(acc·2^-frac + 0.5)`` is then exactly the
    golden bias-add-arithmetic-shift (scaling by a power of two is
    mantissa-preserving).  Asserted bit-exact vs golden in tests.
    """
    import ml_dtypes

    h_fixed = np.asarray(h_fixed, np.int64)
    as_bf16 = h_fixed.astype(np.float32).astype(
        ml_dtypes.bfloat16).astype(np.float64)
    if not np.array_equal(as_bf16, h_fixed.astype(np.float64)):
        return False
    worst = 255 * int(np.abs(h_fixed).sum()) + (1 << (qformat.frac_bits - 1))
    return worst < (1 << 24) and worst < (1 << (qformat.acc_bits - 1))


def build_bf16_band_planes_2d(h_fixed: np.ndarray):
    """Per-tap-row bf16 band planes for the float 2-D path (r5).

    One (128, 128) plane per NONZERO tap row — digit decomposition
    disappears entirely (the quantized integer coefficients ride as
    bf16 values, rounded to 8-bit mantissa ⇒ SNR-gated, not
    bit-exact).  Returns ``(a_cur, plan2)`` with ``plan2`` tuples of
    ``(row_shift, plane)``.
    """
    import ml_dtypes

    h_fixed = np.asarray(h_fixed, np.int64)
    taps_r, taps_c = h_fixed.shape
    center = taps_c // 2
    i_idx = np.arange(LANE)[None, :]
    j_idx = np.arange(LANE)[:, None]
    k = i_idx + center - j_idx
    valid = (k >= 0) & (k < taps_c)
    planes, plan2 = [], []
    for kr in range(taps_r):
        row = h_fixed[kr]
        if not np.any(row):
            continue
        a = np.zeros((LANE, LANE), np.float32)
        a[valid] = row.astype(np.float32)[k[valid]]
        plan2.append((taps_r - 1 - kr, len(planes)))
        planes.append(a.astype(ml_dtypes.bfloat16))
    if not planes:
        planes.append(np.zeros((LANE, LANE), ml_dtypes.bfloat16))
    return np.stack(planes), tuple(plan2)


def _fir2d_oframe_bf16_kernel(
    a_ref,       # (R, 128, 128) bf16 band planes (quantized row values)
    head_ref,    # (T0, Wp) uint8
    body_ref,    # (BR, Wp) uint8
    tail_ref,    # (T0, Wp) uint8
    *rest,       # [scratch_ref] if aliased, then o_ref
    plan2: tuple[tuple[int, int], ...],
    left: int,
    center: int,
    stride: int,
    t0: int,
    core_h: int,
    core_w: int,
    frac_bits: int,
):
    """SNR-gated bf16 overlapped-frame 2-D FIR: one bf16 dot per tap
    ROW (f32 accumulate), float epilogue — no rebias pass, no per-plane
    exponent shifts, no wraparound logic.  Border/patch structure
    matches the int8 kernel's ``acc_patch`` form (measured neutral)."""
    o_ref = rest[-1]
    r = pl.program_id(0)
    block_rows, wp = body_ref.shape
    w_tiles = wp // LANE

    def widen(u8):
        return u8.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    x_full = jnp.concatenate(
        [widen(head_ref[:]), widen(body_ref[:]), widen(tail_ref[:])],
        axis=0,
    )
    row_global = r * block_rows + jax.lax.broadcasted_iota(
        jnp.int32, (block_rows, LANE), 0)
    core_row = (row_global >= t0) & (row_global < t0 + core_h)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 1)

    zero_tile = jnp.zeros((block_rows, LANE), jnp.uint8)
    o_ref[:, :LANE] = zero_tile
    o_ref[:, (w_tiles - 1) * LANE:] = zero_tile

    shifted = {}
    for row_shift, _ in plan2:
        if row_shift not in shifted:
            shifted[row_shift] = x_full[row_shift : row_shift + block_rows]

    scale = jnp.float32(2.0 ** (-frac_bits))

    def tile_acc(c):
        lo = c * LANE
        acc = None
        for row_shift, plane in plan2:
            prod = jnp.dot(shifted[row_shift][:, lo : lo + LANE],
                           a_ref[plane], preferred_element_type=jnp.float32)
            acc = prod if acc is None else acc + prod
        return acc

    def epilogue(acc):
        y = jnp.floor(acc * scale + jnp.float32(0.5))
        return jnp.clip(y, 0, 255).astype(jnp.int32).astype(jnp.uint8)

    zero_acc = jnp.zeros((block_rows, LANE), jnp.float32)
    prev = zero_acc
    cur = tile_acc(1) if w_tiles > 2 else zero_acc
    for c in range(1, w_tiles - 1):
        nxt = tile_acc(c + 1) if c + 1 < w_tiles - 1 else zero_acc
        assembled = cur
        if left:
            assembled = jnp.where(
                col_idx < left,
                pltpu.roll(prev, (-stride) % LANE, 1), assembled)
        if center:
            assembled = jnp.where(
                col_idx >= LANE - center,
                pltpu.roll(nxt, stride % LANE, 1), assembled)
        out_u8 = epilogue(assembled)
        base = (c - 1) * stride - left
        mask = core_row
        if base < 0:
            mask = mask & (col_idx >= -base)
        if base + LANE > core_w:
            mask = mask & (col_idx < core_w - base)
        out_u8 = jnp.where(mask, out_u8, 0)
        o_ref[:, c * LANE : (c + 1) * LANE] = out_u8
        prev, cur = cur, nxt


@functools.partial(
    jax.jit,
    static_argnames=("plan2", "left", "center", "stride", "t0",
                     "core_h", "core_w", "frac_bits", "block_rows",
                     "aliased", "interpret"),
)
def _fir2d_oframe_bf16(
    x_ext, a_cur, scratch,
    plan2: tuple, left: int, center: int, stride: int, t0: int,
    core_h: int, core_w: int, frac_bits: int, block_rows: int,
    aliased: bool, interpret: bool,
):
    hp, wp = x_ext.shape
    bpt = block_rows // t0
    grid = (hp // block_rows,)
    row_spec = pl.BlockSpec((block_rows, wp), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    halo = lambda idx_fn: pl.BlockSpec(  # noqa: E731
        (t0, wp), idx_fn, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(a_cur.shape, lambda r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        halo(lambda r: (jnp.maximum(r * bpt - 1, 0), 0)),
        row_spec,
        halo(lambda r: (jnp.minimum((r + 1) * bpt, hp // t0 - 1), 0)),
    ]
    args = [a_cur, x_ext, x_ext, x_ext]
    kwargs = {}
    if aliased:
        in_specs.append(row_spec)
        args.append(scratch)
        kwargs["input_output_aliases"] = {4: 0}
    kernel = functools.partial(
        _fir2d_oframe_bf16_kernel,
        plan2=plan2, left=left, center=center, stride=stride, t0=t0,
        core_h=core_h, core_w=core_w, frac_bits=frac_bits,
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


def fir2d_frame_overlap_bf16(
    x_ext,
    h,
    qformat: QFormat = QFormat(),
    *,
    core: tuple[int, int, int],
    block_rows: int | None = None,
    scratch=None,
    interpret: bool | None = None,
) -> jax.Array:
    """SNR-gated bf16 2-D FIR over an overlapped frame (r5).

    Same frame/streaming contract as :func:`fir2d_fixed_frame_overlap`
    but one bf16 MXU dot per tap ROW with f32 accumulation and a float
    epilogue — for coefficient banks (or callers) that tolerate ~8-bit
    coefficient mantissas.  Never auto-dispatched; callers opt in and
    gate on SNR vs the bit-exact path (tests do).
    """
    h_fixed = qformat.quantize_coeffs(np.asarray(h)).astype(np.int64)
    if h_fixed.ndim != 2:
        raise ValueError(f"2-D FIR expects a 2-D kernel, got {h_fixed.shape}")
    a_cur, plan2 = build_bf16_band_planes_2d(h_fixed)
    taps_r, taps_c = h_fixed.shape
    overlap = taps_c - 1
    if not 0 < overlap <= OFRAME_MAX_OVERLAP:
        raise ValueError(
            f"overlapped frame needs 1 < taps_c <= {OFRAME_MAX_OVERLAP + 1}, "
            f"got {taps_c}.")
    center = taps_c // 2
    left = taps_c - 1 - center
    stride = LANE - overlap
    t0, core_h, core_w = core
    e_r = taps_r - 1 - taps_r // 2
    plan2 = tuple((t0 - e_r + rs, p) for rs, p in plan2)
    hp, wp = x_ext.shape
    if block_rows is None:
        block_rows = oframe_geometry(core_h, core_w, taps_r, taps_c)[3]
    block_rows = min(_round_up(block_rows, t0), hp)
    interior = wp // LANE - 2
    if (hp % block_rows or wp % LANE or block_rows % t0
            or interior * stride < core_w):
        raise ValueError(
            f"Overlapped frame ({hp}, {wp}) incompatible with "
            f"block_rows={block_rows}, t0={t0}, stride={stride}.")
    return _fir2d_oframe_bf16(
        x_ext, jnp.asarray(a_cur), scratch, plan2, left, center, stride,
        t0, core_h, core_w, qformat.frac_bits, block_rows,
        scratch is not None,
        (jax.default_backend() != "tpu") if interpret is None else interpret,
    )


def crop_frame_overlap(out_frame, taps_c: int, core: tuple[int, int, int]):
    """Extract the (h_img, w_img) image from an overlapped output frame."""
    t0, h_img, w_img = core
    center = taps_c // 2
    left = taps_c - 1 - center
    stride = LANE - (taps_c - 1)
    hp, wp = out_frame.shape
    w_tiles = wp // LANE
    y = out_frame[t0 : t0 + h_img]
    y = y.reshape(h_img, w_tiles, LANE)[:, 1 : w_tiles - 1,
                                        left : left + stride]
    return y.reshape(h_img, (w_tiles - 2) * stride)[:, :w_img]


def fir2d_fixed_mxu(
    x_u8,
    h,
    qformat: QFormat = QFormat(),
    *,
    block_rows: int | None = None,
    interpret: bool | None = None,
    layout: str = "auto",
) -> jax.Array:
    """Bit-exact fixed-point dense 2-D FIR on the MXU over an (H, W) image.

    Single-shot convenience over the padded-frame kernels: embeds the
    image, filters, crops the core.  ``layout`` picks the frame layout:
    ``"overlap"`` (one aligned dot per digit plane, the fast path for
    ``taps_c ≤ OFRAME_MAX_OVERLAP + 1``), ``"plain"`` (tri-tile band
    kernel, any ``taps_c ≤ 257``), or ``"auto"`` (overlap when it
    fits).  Streaming / chained callers should hold the frame layout and
    call :func:`fir2d_fixed_frame_overlap` / :func:`fir2d_fixed_frame`
    directly — both are shape-preserving and support copy-free scratch
    aliasing.
    """
    taps_r, taps_c = (int(d) for d in np.asarray(h).shape)
    if layout == "auto":
        layout = ("overlap" if 0 < taps_c - 1 <= OFRAME_MAX_OVERLAP
                  else "plain")
    if layout == "overlap":
        x_ext, (t0, h_img, w_img, block_rows) = pad_frame_overlap(
            x_u8, taps_r, taps_c, block_rows=block_rows
        )
        out = fir2d_fixed_frame_overlap(
            x_ext, h, qformat, core=(t0, h_img, w_img),
            block_rows=block_rows, interpret=interpret,
        )
        return crop_frame_overlap(out, taps_c, (t0, h_img, w_img))
    x_ext, (t0, h_img, w_img, block_rows) = pad_frame(
        x_u8, taps_r, block_rows=block_rows
    )
    out = fir2d_fixed_frame(
        x_ext, h, qformat, core=(t0, h_img, w_img), block_rows=block_rows,
        interpret=interpret,
    )
    return out[t0 : t0 + h_img, LANE : LANE + w_img]
