"""MXU Pallas kernel: polyphase rational resampling as banded matmuls.

The polyphase resampler (``ops/resample.py``) in its slice-based form
pays ~P·J elementwise slice-multiply-add passes (64 for the 2/3·63-tap
chain stage) — measured 1.3 Gsps on v5e, 37× off the memory roofline,
and the bottleneck stage of the BASELINE config-5 chain.  This kernel
reformulates the whole rate change as ONE banded matmul per 128-output
tile, the rate-changing generalization of the windowed FIR band kernel
(``fir_mxu.build_window_band_planes``):

    y[m0 + i] = Σ_j x[s_p + j] · A[j, i],       i ∈ [0, 128)
    A[j, i]   = taps[r_i, db_i + (J-1) - j]     (0 ≤ index < J else 0)

with ``r_i = (i·Q + c) mod P``, ``β_i = (i·Q + c − r_i)/P``,
``db_i = β_i − β_0`` and window width ``K = db_127 + J``.  Because the
output tile size 128 is a multiple of P (requires ``P | 128``; P and Q
are coprime so this covers every power-of-two upsample), the band
matrix is tile-independent and the input window advances by the fixed
stride ``ds = 128·Q/P`` per output tile — a contiguous, gather-free
access pattern.

Precision follows the float model kernel (``fir_float_mxu.py``):
``bf16x3`` (default, ~2⁻²¹ relative — far below every acceptance bound)
or ``highest`` (strict f32 dots).  MACs/output = 3·K ≈ 670 for the
chain's 2/3·63-tap stage — memory-bound, not compute-bound.

Replaces the hot loop the reference never had (the resample stage is a
north-star addition; closest reference analogue is the scalar MAC loop
``fir_1d_fixed_ref.py:95-107`` applied per polyphase branch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warmup_fir_filter_tpu.kernels.fir_float_mxu import _split_bf16
from warmup_fir_filter_tpu.kernels.fir_mxu import (
    FULLROW_BLOCK_BYTES,
    LANE,
)
from warmup_fir_filter_tpu.kernels.fir_float_mxu import WIDE_BLOCK_BYTES
from warmup_fir_filter_tpu.ops.resample import _plan, _polyphase_taps

#: Output tiles per segmentation window (128 tiles = 16384 outputs):
#: bounds both the kernel's unrolled tile loop and the VMEM block size.
MAX_OUT_TILES = 128


def build_resample_band(
    h: np.ndarray, up: int, down: int, group: int = 1
) -> tuple[np.ndarray, int, int, int, int]:
    """Tile-independent resampling band matrix.

    Returns ``(A, K, ds, beta0, J)``: the (K, group·128) float32 band,
    its row count, the per-GROUP input stride ``ds = group·128·Q/P``,
    ``β_0`` (the input anchor of output 0, used by callers to position
    the first window), and the branch length J.  Requires ``P | 128``.

    ``group`` maps ``group`` consecutive output lane tiles through ONE
    band (one dot per bf16 term).  When ``P | group`` the group input
    stride is a multiple of 128, so a caller that absorbs the constant
    sub-tile offset of the first window into extra zero band rows reads
    every window LANE-ALIGNED — the r3 2-D ablation measured misaligned
    band operands at ~½ the aligned rate, and grouping also amortizes
    the per-dot MXU overhead over ``group`` output tiles.
    """
    if 128 % up:
        raise ValueError(
            f"MXU resample band needs up | 128 (tile-periodic), got up={up}."
        )
    h64 = np.asarray(h, np.float64)
    num_taps = int(h64.size)
    center = num_taps // 2
    taps = _polyphase_taps(h64, up)  # (P, J)
    j_count = taps.shape[1]
    i = np.arange(group * LANE)
    u = i * down + center
    r_i = u % up
    beta = (u - r_i) // up
    db = beta - beta[0]
    k_rows = int(db[-1]) + j_count
    a = np.zeros((k_rows, group * LANE), np.float32)
    for col in range(group * LANE):
        rows = db[col] + (j_count - 1) - np.arange(j_count)
        a[rows, col] = taps[r_i[col]]
    ds = group * 128 * down // up
    return a, k_rows, ds, int(beta[0]), j_count


def _resample_f32_kernel(
    a_hi_ref,   # (K, 128) band (bf16 hi or f32)
    a_lo_ref,   # (K, 128) bf16 lo residual (bf16x3 only; dummy otherwise)
    body_ref,   # (BR, W) f32 input windows
    o_ref,      # (BR, M) f32 outputs
    *,
    ds: int,
    k_rows: int,
    s_base: int,
    bf16x3: bool,
):
    x = body_ref[:]
    m = o_ref.shape[1]
    out_tiles = m // LANE
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if bf16x3:
        xh, xl = _split_bf16(x)
        for p in range(out_tiles):
            s = s_base + p * ds
            hs, ls = xh[:, s : s + k_rows], xl[:, s : s + k_rows]
            # bf16x3: hi·hi + lo·hi + hi·lo (lo·lo ≈ 2^-32 relative).
            acc = (dot(hs, a_hi_ref[:]) + dot(ls, a_hi_ref[:])
                   + dot(hs, a_lo_ref[:]))
            o_ref[:, p * LANE : (p + 1) * LANE] = acc
    else:
        dot = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)
        for p in range(out_tiles):
            s = s_base + p * ds
            o_ref[:, p * LANE : (p + 1) * LANE] = dot(
                x[:, s : s + k_rows], a_hi_ref[:]
            )


def _resample_f32_wide_kernel(
    a_hi_ref,   # (K, 128) band (bf16 hi or f32)
    a_lo_ref,   # (K, 128) bf16 lo residual (dummy when not bf16x3)
    xm_ref,     # (BR, seg_in) f32 input superblock
    xp_ref,     # (BR, 128) previous superblock's tail tile
    xn_ref,     # (BR, 128) next superblock's head tile
    o_ref,      # (BR, seg_out) f32 outputs
    *,
    ds: int,
    k_rows: int,
    first_read: int,
    n: int,
    bf16x3: bool,
    span: int,
):
    """Grid-native resample program (r3: zero staging copies).

    Output superblock ``c`` consumes exactly ``seg_in = seg_out·Q/P``
    input columns starting at ``c·seg_in`` (tile-aligned because
    ``P | tiles_per_seg``), plus ≤ one lane tile of margin each side —
    carried by two halo operands of the *same* array, exactly the wide
    FIR design (``fir_float_mxu._fir_f32_wide_kernel``).  Stream edges
    and the ragged tail are zeroed in-kernel (the same-mode contract's
    zero-pad), so the input is never padded or re-laid-out in HBM.

    ``span`` is the output width (lanes) each band dot produces: with a
    grouped band (``build_resample_band(group=span // 128)``) and
    ``first_read``/``k_rows`` pre-adjusted by the caller so every
    ``s`` lands on a lane-tile boundary, the operand slices below are
    lane-ALIGNED.  Mechanism only — the grouped band was measured
    monotonically WORSE on the chain's 2/3·63-tap stage (dot cost
    scales with streamed band rows K, not per-dot overhead; ablation
    note in ``resample_poly_mxu`` and docs/roofline.md), so auto
    dispatch always picks span=128; the knob remains for future shapes.
    """
    c = pl.program_id(1)
    seg_in = xm_ref.shape[1]
    out_tiles = o_ref.shape[1] // LANE
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    x = xm_ref[:]
    col_abs = c * seg_in + jax.lax.broadcasted_iota(
        jnp.int32, (1, seg_in), 1)
    x = jnp.where(col_abs < n, x, jnp.float32(0.0))
    prev_t = jnp.where(c == 0, jnp.float32(0.0), xp_ref[:])
    nxt_abs = (c + 1) * seg_in + jax.lax.broadcasted_iota(
        jnp.int32, (1, LANE), 1)
    next_t = jnp.where(nxt_abs < n, xn_ref[:], jnp.float32(0.0))
    x_full = jnp.concatenate([prev_t, x, next_t], axis=1)

    if bf16x3:
        xh, xl = _split_bf16(x_full)
        for p in range(out_tiles * LANE // span):
            s = LANE + first_read + p * ds
            hs, ls = xh[:, s : s + k_rows], xl[:, s : s + k_rows]
            acc = (dot(hs, a_hi_ref[:]) + dot(ls, a_hi_ref[:])
                   + dot(hs, a_lo_ref[:]))
            o_ref[:, p * span : (p + 1) * span] = acc
    else:
        dot = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)
        for p in range(out_tiles * LANE // span):
            s = LANE + first_read + p * ds
            o_ref[:, p * span : (p + 1) * span] = dot(
                x_full[:, s : s + k_rows], a_hi_ref[:]
            )


def _resample_f32_wide_chunk_kernel(
    a_hi_ref,   # (K, 128) band (bf16 hi or f32)
    a_lo_ref,   # (K, 128) bf16 lo residual (dummy when not bf16x3)
    xm_ref,     # (BR, seg_in) f32 input superblock
    xp_ref,     # (BR, 128) previous superblock's tail tile
    xn_ref,     # (BR, 128) next superblock's head tile
    o_ref,      # (BR, seg_out) f32 outputs
    *,
    ds: int,
    k_rows: int,
    first_read: int,
    n: int,
    bf16x3: bool,
    unroll: int,
):
    """Capped-unroll resample program: fori_loop over output-tile chunks.

    The chunked variant of ``_resample_f32_wide_kernel`` (same
    contract): ``unroll`` output lane tiles per chunk, with ``up |
    unroll`` so the chunk's input stride ``unroll·ds`` is lane-tile
    aligned — every dynamic load/store offset carries a
    ``pl.multiple_of`` proof, and the rate-changing (misaligned) window
    slicing stays static inside the chunk.  Built to lift the
    superblock (= DMA block) size past the fully-unrolled kernel's
    compile-time limit; the r4 ablation measured big blocks SLOWER
    (docs/roofline.md "capped-unroll ablation"), so auto dispatch keeps
    the r3 geometry (one chunk per superblock → the unrolled kernel)
    and this body runs only under an explicit ``unroll=`` knob.
    """
    c = pl.program_id(1)
    seg_in = xm_ref.shape[1]
    out_tiles = o_ref.shape[1] // LANE
    n_chunks = out_tiles // unroll
    cw_out = unroll * LANE
    cw_in = unroll * ds
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if not bf16x3:
        dot = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)

    prev_sb = jnp.where(c == 0, jnp.float32(0.0), xp_ref[:])
    nxt_abs = (c + 1) * seg_in + jax.lax.broadcasted_iota(
        jnp.int32, (1, LANE), 1)
    next_sb = jnp.where(nxt_abs < n, xn_ref[:], jnp.float32(0.0))

    def chunk(i, _):
        ib = pl.multiple_of(i * cw_in, LANE)
        mid = xm_ref[:, pl.ds(ib, cw_in)]
        col_abs = c * seg_in + ib + jax.lax.broadcasted_iota(
            jnp.int32, (1, cw_in), 1)
        mid = jnp.where(col_abs < n, mid, jnp.float32(0.0))
        lt_off = pl.multiple_of(jnp.maximum(ib - LANE, 0), LANE)
        lt = jnp.where(i == 0, prev_sb, xm_ref[:, pl.ds(lt_off, LANE)])
        rt_off = pl.multiple_of(jnp.minimum(ib + cw_in, seg_in - LANE),
                                LANE)
        rt_raw = xm_ref[:, pl.ds(rt_off, LANE)]
        rt_abs = c * seg_in + ib + cw_in + jax.lax.broadcasted_iota(
            jnp.int32, (1, LANE), 1)
        rt = jnp.where(i == n_chunks - 1, next_sb,
                       jnp.where(rt_abs < n, rt_raw, jnp.float32(0.0)))
        x_full = jnp.concatenate([lt, mid, rt], axis=1)

        accs = []
        if bf16x3:
            xh, xl = _split_bf16(x_full)
            for p in range(unroll):
                s = LANE + first_read + p * ds
                hs, ls = xh[:, s : s + k_rows], xl[:, s : s + k_rows]
                accs.append(dot(hs, a_hi_ref[:]) + dot(ls, a_hi_ref[:])
                            + dot(hs, a_lo_ref[:]))
        else:
            for p in range(unroll):
                s = LANE + first_read + p * ds
                accs.append(dot(x_full[:, s : s + k_rows], a_hi_ref[:]))
        o_ref[:, pl.ds(pl.multiple_of(i * cw_out, LANE), cw_out)] = (
            jnp.concatenate(accs, axis=1))
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


@functools.partial(
    jax.jit,
    static_argnames=("ds", "k_rows", "first_read", "seg_in", "seg_out",
                     "out_len", "block_rows", "bf16x3", "interpret", "span",
                     "unroll"),
)
def _resample_f32_wide(
    x,  # (B, n) f32 — the original rows, no staging
    a_hi,
    a_lo,
    ds: int,
    k_rows: int,
    first_read: int,
    seg_in: int,
    seg_out: int,
    out_len: int,
    block_rows: int,
    bf16x3: bool,
    interpret: bool,
    span: int = LANE,
    unroll: int | None = None,
):
    batch, n = x.shape
    grid_rows = -(-batch // block_rows)
    grid_cols = -(-out_len // seg_out)
    t_in = seg_in // LANE
    n_tiles = -(-n // LANE)
    main_spec = pl.BlockSpec((block_rows, seg_in), lambda r, c: (r, c),
                             memory_space=pltpu.VMEM)
    prev_spec = pl.BlockSpec(
        (block_rows, LANE),
        lambda r, c: (r, jnp.maximum(c * t_in - 1, 0)),
        memory_space=pltpu.VMEM)
    next_spec = pl.BlockSpec(
        (block_rows, LANE),
        lambda r, c: (r, jnp.minimum((c + 1) * t_in, n_tiles - 1)),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block_rows, seg_out), lambda r, c: (r, c),
                            memory_space=pltpu.VMEM)
    band_spec = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda r, c: (0, 0), memory_space=pltpu.VMEM)
    if unroll is not None and unroll * LANE < seg_out:
        if span != LANE:
            raise ValueError("chunked resample kernel requires span=128")
        if (seg_out // LANE) % unroll or (unroll * ds) % LANE:
            raise ValueError(
                f"unroll={unroll} incompatible with seg_out={seg_out}, "
                f"ds={ds} (needs unroll | out tiles and 128 | unroll·ds)")
        body = functools.partial(
            _resample_f32_wide_chunk_kernel, ds=ds, k_rows=k_rows,
            first_read=first_read, n=n, bf16x3=bf16x3, unroll=unroll,
        )
    else:
        body = functools.partial(
            _resample_f32_wide_kernel, ds=ds, k_rows=k_rows,
            first_read=first_read, n=n, bf16x3=bf16x3, span=span,
        )
    return pl.pallas_call(
        body,
        grid=(grid_rows, grid_cols),
        in_specs=[band_spec(a_hi), band_spec(a_lo), main_spec, prev_spec,
                  next_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((batch, out_len), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(a_hi, a_lo, x, x, x)


@functools.partial(
    jax.jit,
    static_argnames=("ds", "k_rows", "s_base", "m", "block_rows", "bf16x3",
                     "interpret"),
)
def _resample_f32(
    windows,  # (B', W) f32
    a_hi,
    a_lo,
    ds: int,
    k_rows: int,
    s_base: int,
    m: int,
    block_rows: int,
    bf16x3: bool,
    interpret: bool,
):
    batch, w = windows.shape
    in_spec = pl.BlockSpec((block_rows, w), lambda r: (r, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block_rows, m), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    band_spec = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda r: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _resample_f32_kernel, ds=ds, k_rows=k_rows, s_base=s_base,
            bf16x3=bf16x3,
        ),
        grid=(-(-batch // block_rows),),
        in_specs=[band_spec(a_hi), band_spec(a_lo), in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((batch, m), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(a_hi, a_lo, windows)


def resample_poly_mxu(
    x,
    h,
    up: int,
    down: int,
    *,
    precision: str = "bf16x3",
    block_rows: int | None = None,
    interpret: bool | None = None,
    max_out_tiles: int = MAX_OUT_TILES,
    group: int | None = None,
    unroll: int | None = None,
) -> jax.Array:
    """Float32 polyphase resampler on the MXU over (C, T) rows.

    Same rate-change contract as ``ops.resample.resample_poly`` (the
    same-mode polyphase derivation, module docstring there); numerics
    are bf16x3 (~114 dB vs float64) or strict-f32 ``highest`` instead of
    the slice path's exact f32 accumulation order.

    Dispatch (r3): the default path is the grid-native wide kernel
    (``_resample_f32_wide``) — column superblocks of the original rows
    with one-lane-tile halo operands, zero staging copies; measured
    2.28 → 1.39 ms on the chain's 32 × 2 M 2/3-resample stage on v5e.
    Branches too long for its one-tile halo budget (J ≳ 100 taps per
    polyphase branch) fall back to the windowed path below: long
    streams are windowed into ≤``MAX_OUT_TILES``-tile segments whose
    margins carry
    the true neighboring samples (zeros at stream edges — the contract's
    zero-pad), stacked batch-major so the kernel sees row-rich blocks.
    """
    if precision not in ("bf16x3", "highest"):
        raise ValueError(f"unknown precision {precision!r}")
    if group is not None and group < 1:
        raise ValueError(f"group must be >= 1, got {group}")
    h64 = np.asarray(h, np.float64)
    x_f32 = jnp.asarray(x, jnp.float32)
    batch, n = x_f32.shape
    out_len, _, _, _ = _plan(n, up, down, h64.size)
    a, k_rows, ds, beta0, j_count = build_resample_band(h64, up, down)
    bf16x3 = precision == "bf16x3"
    interp = (jax.default_backend() != "tpu") if interpret is None \
        else interpret

    # Grid-native fast path (r3): walk output superblocks of the
    # original array with one-lane-tile halos — no pad / window-concat
    # staging (the r2 segmentation paid ~3 extra HBM passes).  Needs the
    # band window to fit the superblock + halos: one halo tile on the
    # left (first_read ≥ −128) and one on the right
    # (first_read + K − ds ≤ 128) — true for every J ≲ 100-tap branch;
    # longer branches fall back to the windowed path below.
    #
    # Auto dispatch keeps the r3 geometry: ONE fully-unrolled chunk per
    # superblock.  The capped-unroll/chunked body engages only under an
    # explicit ``unroll=`` knob — the r4 ablation measured it SLOWER
    # (304 vs 369 GB/s unrolled; >=16 MB blocks lose to 8 MB even for a
    # bare copy, docs/roofline.md "f32 streaming wall"), so bigger
    # multi-chunk superblocks are never the default.
    from warmup_fir_filter_tpu.kernels.fir_float_mxu import (
        WIDE_SEG_TILES,
        WIDE_UNROLL_TILES,
    )

    if unroll is not None and (unroll < 1 or unroll % up):
        raise ValueError(f"unroll must be a positive multiple of up={up}, "
                         f"got {unroll}")
    unroll_out = (up * max(1, WIDE_UNROLL_TILES // up) if unroll is None
                  else unroll)
    chunk_in_tiles = unroll_out * down // up
    out_tiles_needed = -(-out_len // (unroll_out * LANE))
    if unroll is None:
        n_chunks = 1
    else:
        n_chunks = max(1, min(WIDE_SEG_TILES // max(chunk_in_tiles, 1),
                              out_tiles_needed))
    tiles_per_seg = unroll_out * n_chunks
    seg_out_w = tiles_per_seg * LANE
    seg_in_w = tiles_per_seg * ds
    first_read = beta0 - (j_count - 1)
    if (first_read >= -LANE and first_read + k_rows - ds <= LANE
            and seg_in_w == tiles_per_seg * ds):
        # Aligned grouped band (r3 ablation, REJECTED as default): with
        # up | group the group stride is a multiple of 128, so absorbing
        # the constant sub-tile offset into `offset` zero band rows
        # makes every operand slice lane-aligned and amortizes the
        # per-dot overhead ×group.  Measured on the chain's 2/3·63-tap
        # 32×2M stage (v5e): group=1 1.23 ms (348 GB/s) → g=2 1.44 →
        # g=4 2.69 → g=8 5.03 ms — MONOTONICALLY WORSE: at these shapes
        # dot cost scales with streamed band rows K (≈ g·128·Q/P + J),
        # not per-dot overhead, and operand alignment is not the
        # bottleneck (the f32 wide kernels sit at the measured f32
        # streaming rate, see docs/roofline.md).  Kept as an explicit
        # knob for future shapes; auto always picks 1.
        g = 1 if group is None else group
        if g == 1:
            a_g, k_g, ds_g, fr_g = a, k_rows, ds, first_read
        else:
            # Grouped knob runs on the fully-unrolled kernel — keep its
            # r3 superblock size (compile time scales with seg tiles).
            tiles_per_seg = up * max(1, 64 // up)
            seg_out_w = tiles_per_seg * LANE
            seg_in_w = tiles_per_seg * ds
            a_g, k_g, ds_g, beta0_g, j_g = build_resample_band(
                h64, up, down, g)
            fr_g = beta0_g - (j_g - 1)
            off = (LANE + fr_g) % LANE
            a_g = np.pad(a_g, ((off, 0), (0, 0)))
            k_g += off
            fr_g -= off
            fits = (fr_g >= -LANE and fr_g + k_g - ds_g <= LANE
                    and seg_in_w % ds_g == 0
                    and k_g * g * LANE * 4 <= 16 * 1024 * 1024)
            if not fits:
                # An explicit group that cannot be realized is an error,
                # not a silent fallback — the knob exists only for
                # measurement, and a vacuous pass would invalidate it.
                raise ValueError(
                    f"group={g} does not fit this band geometry "
                    f"(first_read={fr_g}, k_rows={k_g}, ds={ds_g}, "
                    f"seg_in={seg_in_w}); use group=None for auto."
                )
        if bf16x3:
            a_hi, a_lo = _split_bf16(jnp.asarray(a_g))
        else:
            a_hi = jnp.asarray(a_g)
            a_lo = jnp.zeros_like(a_hi)
        if block_rows is None:
            by_vmem = max(1, WIDE_BLOCK_BYTES // (4 * seg_in_w))
            block_rows = int(min(-(-max(batch, 1) // 8) * 8,
                                 -(-by_vmem // 8) * 8))
        return _resample_f32_wide(
            x_f32, a_hi, a_lo, ds_g, k_g, fr_g, seg_in_w,
            seg_out_w, out_len, block_rows, bf16x3, interp,
            span=g * LANE,
            unroll=unroll_out if g == 1 else None,
        )

    out_tiles_total = -(-out_len // LANE)
    tiles_per_seg = min(out_tiles_total, max_out_tiles)
    seg_out = tiles_per_seg * LANE
    seg_in = seg_out * down // up
    n_seg = -(-out_tiles_total // tiles_per_seg)

    # Left pad so the first window's earliest read (β_0 − (J−1), i.e.
    # row 0 of the band at tile 0) is in bounds; zeros realize the
    # same-mode zero-pad exactly (float path: pad value 0 contributes 0).
    first_read = beta0 - (j_count - 1)
    pad_l = max(0, -first_read)
    s_base = first_read + pad_l
    win_w = s_base + (tiles_per_seg - 1) * ds + k_rows
    total_needed = (n_seg - 1) * seg_in + win_w
    xp_width = max(pad_l + n, total_needed)
    xp = jnp.pad(x_f32, ((0, 0), (pad_l, xp_width - pad_l - n)))

    if n_seg == 1:
        windows = xp[:, :win_w]
    else:
        windows = jnp.concatenate(
            [xp[:, w * seg_in : w * seg_in + win_w] for w in range(n_seg)],
            axis=0,
        )
    if block_rows is None:
        by_vmem = max(1, FULLROW_BLOCK_BYTES // (4 * win_w))
        block_rows = int(min(-(-max(batch, 1) // 8) * 8,
                             -(-by_vmem // 8) * 8))
    bf16x3 = precision == "bf16x3"
    if bf16x3:
        a_hi, a_lo = _split_bf16(jnp.asarray(a))
    else:
        a_hi = jnp.asarray(a)
        a_lo = jnp.zeros_like(a_hi)
    out = _resample_f32(
        windows, a_hi, a_lo, ds, k_rows, s_base, seg_out, block_rows,
        bf16x3,
        (jax.default_backend() != "tpu") if interpret is None else interpret,
    )
    if n_seg > 1:
        out = jnp.concatenate(
            [out[w * batch : (w + 1) * batch] for w in range(n_seg)],
            axis=1,
        )
    return out[:, :out_len]
