"""Single-pass fused DSP chain kernel: resample → channelize → FM demod.

The r4 structural optimization of the BASELINE config-5 chain.  The r3
chain ran three separate device passes (polyphase 2/3 resample, 63-tap
channelizer, FM demod), each individually AT the Pallas f32 streaming
rate (~350-370 GB/s, docs/roofline.md "f32 streaming wall") — but the
chain's end-to-end cost was the SUM of their HBM round trips
(~1.6 GB per 16ch × 2M apply).  The r4 capped-unroll ablation settled
that no per-stage kernel can go meaningfully faster (the Pallas block
pipeline binds at ~360 GB/s while XLA's fused elementwise reaches
643 GB/s); the remaining lever is FEWER PASSES.

This kernel runs the whole chain in ONE Pallas pass: input I/Q planes
are read once (stacked as 2C rows so both planes ride the same band
matmuls), the resampled and channelized intermediates live only in
VMEM scratch tiles, and the FM discriminator — including a hand-rolled
polynomial ``atan2`` (Mosaic has no atan2 lowering) — writes the final
message rows.  HBM traffic per apply drops 3.0× (staged: 8·n_in
samples of f32 traffic; fused: 2·n_in in + (2/3)·n_in out), and the
two inter-stage kernel-launch round trips disappear.  Measured on v5e
at 16ch × 2M: 9,081 → 20,281 Msps (same harness).

Stage semantics match the staged ops exactly (same band matrices, same
zero-pad/edge contracts):

- resample: ``ops/resample.py`` same-mode polyphase contract via
  ``resample_mxu.build_resample_band`` (the tile-periodic band).
- channelize: ``ops/fir1d.py`` same-mode zero-pad FIR via
  ``fir_float_mxu.build_tile_band_planes_f32`` (tri-tile band, with the
  side-dot merge for taps ≤ 129).
- demod: ``ops/demod.py`` polar discriminator, first output 0.

Numerics: bf16x3 band dots (~114 dB SNR, the chain's default) or
strict-f32 ``highest``; the polynomial atan2 is accurate to ~2.4e-7 max
abs error vs ``np.arctan2`` (f32 ulp level — measured on v5e).

Reference lineage: the chain itself is the north-star addition (no
reference analogue); the per-stage semantics it fuses descend from the
reference's scalar FIR hot loop (``fir_1d_fixed_ref.py:95-107``) and
complex scaffolding (``lib/mycomplex.h:10-41``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warmup_fir_filter_tpu.kernels.fir_float_mxu import (
    _split_bf16,
    build_tile_band_planes_f32,
)
from warmup_fir_filter_tpu.kernels.fir_mxu import LANE
from warmup_fir_filter_tpu.kernels.resample_mxu import build_resample_band
from warmup_fir_filter_tpu.ops.resample import _plan

#: Output lane tiles per fused superblock.  64 tiles keeps the fully
#: unrolled three-stage body at a sane compile time (~600 dots).
FUSED_SEG_TILES = 64

#: Column-superblocks row-folded per program (see the kernel's folding
#: note).  MEASURED NEUTRAL on v5e (interleaved A/B at 16ch × 2M:
#: fold 1/2/4 medians 16.3/16.5/15.5 Gsps — one noise band), as was
#: the vstacked-operand ``opt="stacked"`` form: the fused chain is
#: bound by its total in-kernel elementwise work, not by MXU fill
#: latency or program count.  Kept as a documented knob; default 1.
FUSED_FOLD = 1

#: Candidate input-halo widths (lane tiles) per superblock side.  The
#: halo must cover the two extra resampled tiles each side (one beyond
#: the extra channelizer tile); wide-stride / long-branch configs (e.g.
#: pure decimation) need more than the flagship's 4 tiles, and wider
#: halos cost proportionally more re-read traffic, so the smallest
#: sufficient width that also divides the superblock is chosen.
_HALO_TILE_CHOICES = (4, 8, 16, 32)


def _halo_tiles_for(ds: int, first_read: int, k_rows: int,
                    seg_in_tiles: int) -> int | None:
    """Smallest halo width (tiles) covering the resample margins, or
    None if no candidate fits this geometry."""
    for h in _HALO_TILE_CHOICES:
        halo = h * LANE
        if (2 * ds - first_read <= halo
                and first_read + k_rows + ds <= halo
                and seg_in_tiles % h == 0):
            return h
    return None


def _atan2_coeffs() -> np.ndarray:
    """Odd-polynomial fit of atan(a) = a·P(a²) on a ∈ [0, 1].

    Least-squares on Chebyshev nodes, degree 10 in a² — residual
    ~1.5e-10 (float64 fit), far below f32 resolution.  Deterministic.
    """
    a = np.cos(np.pi * (np.arange(2000) + 0.5) / 2000) * 0.5 + 0.5
    s = a * a
    v = np.vander(s, 11, increasing=True) * a[:, None]
    coef, *_ = np.linalg.lstsq(v, np.arctan(a), rcond=None)
    return coef


_ATAN_COEF = _atan2_coeffs()


def atan2_poly(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Vectorized four-quadrant atan2 from VPU-lowered primitives.

    Mosaic has no ``atan2`` lowering; this is the standard
    octant-reduced polynomial form (measured 2.4e-7 max abs error vs
    ``np.arctan2`` on v5e).  ``atan2(0, 0) = 0`` like numpy.
    """
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.where(hi == 0, jnp.float32(1), hi)
    s = a * a
    p = jnp.float32(_ATAN_COEF[10])
    for c in _ATAN_COEF[9::-1]:
        p = p * s + jnp.float32(c)
    r = p * a
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    # copysign, not where(y<0): atan2(-0.0, -1) is -π like numpy.
    return jnp.copysign(r, y)


def _chain_fused_kernel(
    rs_bounds_ref,  # SMEM (2,) i32: valid [lo, hi) window in rs space
    # Band operands (hi then lo planes; lo are dummies for "highest").
    rs_hi_ref, rs_lo_ref,          # (K, 128) resample band
    chp_hi_ref, chc_hi_ref, chn_hi_ref,   # channelizer tri-band hi
    chp_lo_ref, chc_lo_ref, chn_lo_ref,   # channelizer tri-band lo
    xm_ref,    # (2C, seg_in) stacked I/Q input superblock
    xl_ref,    # (2C, H·128) left input halo
    xr_ref,    # (2C, H·128) right input halo
    o_ref,     # (C, seg_out) demodulated message block
    *,
    ds: int,
    k_rows: int,
    first_read: int,
    ch_left: int,
    ch_center: int,
    n: int,
    out_len: int,
    channels: int,
    seg_tiles: int,
    inv_gain: float,
    precision: str,
    opt: str = "base",
    fold: int = 1,
):
    bf16x3 = precision == "bf16x3"
    pure_bf16 = precision == "bf16"
    c = pl.program_id(0)
    rows0 = xm_ref.shape[0]
    seg_in = xm_ref.shape[1] // fold
    halo = xl_ref.shape[1]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if precision == "highest":
        dot = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)

    # --- assemble the extended input window (stream edges zeroed) ---
    # Column-superblock ROW-FOLDING (r4): the program's main block
    # covers ``fold`` consecutive superblocks; their extended windows
    # have identical local geometry, so stacking them as extra ROWS
    # lets every band dot run at fold·2C rows — the dots are
    # fill-latency-bound at 32 rows, so a 128-row dot costs roughly
    # what a 32-row dot does and per-sample MXU time drops ~fold×.
    # The inter-superblock halos inside the folded span are just
    # adjacent columns of the same block; only the outer edges use the
    # halo operands.
    # opt values "no_masks" / "cheap_demod" are MEASUREMENT-ONLY
    # ablations (wrong at stream edges / wrong demod): they isolate the
    # cost of the edge masking and of the polynomial discriminator on
    # real hardware (docs/roofline.md).
    do_masks = opt != "no_masks"
    x = xm_ref[:]
    zero = jnp.zeros((), x.dtype)  # dtype-safe (bf16 storage mode)
    if do_masks:
        col_abs = c * fold * seg_in + jax.lax.broadcasted_iota(
            jnp.int32, (1, fold * seg_in), 1)
        x = jnp.where(col_abs < n, x, zero)
        lt = jnp.where(c == 0, zero, xl_ref[:])
        rt_abs = (c + 1) * fold * seg_in + jax.lax.broadcasted_iota(
            jnp.int32, (1, halo), 1)
        rt = jnp.where(rt_abs < n, xr_ref[:], zero)
    else:
        lt, rt = xl_ref[:], xr_ref[:]
    x_all = jnp.concatenate([lt, x, rt], axis=1)
    if fold == 1:
        x_ext = x_all
    else:
        x_ext = jnp.concatenate(
            [x_all[:, f * seg_in : (f + 1) * seg_in + 2 * halo]
             for f in range(fold)], axis=0)  # (fold·2C, seg_in + 2·halo)

    stacked = bf16x3 and opt == "stacked"

    def band_apply(hi_arr, lo_arr, st_arr, cols, a_hi, a_lo):
        """One banded contribution; ``cols`` is a slice or a tuple of
        slices (concatenated along lanes).

        bf16x3 "stacked" form (r4): the hi and lo operand rows ride ONE
        dot as a vstacked (2·2C, K) operand — MXU passes at these row
        counts are fill-latency-bound, so (64,K)·(K,128) costs what
        (32,K)·(K,128) does and the hi·A + lo·A pair collapses into one
        pass plus a sublane-aligned half add: 3 dots → 2 per band.
        """
        def take(arr):
            if isinstance(cols, tuple):
                return jnp.concatenate([arr[:, sl] for sl in cols], axis=1)
            return arr[:, cols]
        if not bf16x3:
            return dot(take(hi_arr), a_hi)
        if st_arr is not None:
            both = dot(take(st_arr), a_hi)
            nr = hi_arr.shape[0]
            return both[:nr] + both[nr:] + dot(take(hi_arr), a_lo)
        return (dot(take(hi_arr), a_hi) + dot(take(lo_arr), a_hi)
                + dot(take(hi_arr), a_lo))

    if bf16x3:
        xh, xlo = _split_bf16(x_ext)
        xst = jnp.concatenate([xh, xlo], axis=0) if stacked else None
    else:
        # "highest": f32 operand; "bf16": the operand arrives ALREADY
        # bf16 from HBM (half the input traffic, one single-pass dot
        # per band, no splits) — the storage mode VERDICT r4 task 2
        # names as the only untried chain lever.
        xh, xlo, xst = x_ext, None, None

    # --- stage 1: resample tiles q ∈ [-2, seg_tiles+1) into scratch ---
    rs_tiles = []
    for q in range(-2, seg_tiles + 1):
        s = halo + q * ds + first_read
        rs_tiles.append(band_apply(
            xh, xlo, xst, slice(s, s + k_rows),
            rs_hi_ref[:], rs_lo_ref[:]))
    rs = jnp.concatenate(rs_tiles, axis=1)  # (fold·2C, (seg_tiles+3)·128)
    # Same-mode pad of the *resampled* stream: zero cols outside
    # [0, out_len) so the channelizer sees the staged path's zero-pad.
    # With folding the absolute position depends on which fold a ROW
    # belongs to: fold f covers output superblock c·fold + f.
    if do_masks:
        f_of_row = jax.lax.broadcasted_iota(
            jnp.int32, (rs.shape[0], rs.shape[1]), 0) // rows0
        rs_abs = ((c * fold * seg_tiles - 2) * LANE
                  + f_of_row * seg_tiles * LANE
                  + jax.lax.broadcasted_iota(
                      jnp.int32, (rs.shape[0], rs.shape[1]), 1))
        # Valid window in RESAMPLED space.  Defaults to [0, out_len)
        # (the same-mode zero-pad of the resampled stream); the
        # time-sharded path passes the GLOBAL window in local ext
        # coordinates so shard-edge blocks zero-pad exactly where the
        # single-device run does (models/chain.py,
        # chain_forward_time_sharded).
        rs = jnp.where((rs_abs >= rs_bounds_ref[0])
                       & (rs_abs < rs_bounds_ref[1]), rs,
                       jnp.float32(0.0))

    if bf16x3:
        rh, rl = _split_bf16(rs)
        rst = jnp.concatenate([rh, rl], axis=0) if stacked else None
    elif pure_bf16:
        # bf16 scratch: half the stage-2 operand bytes, single-pass dots
        rh, rl, rst = rs.astype(jnp.bfloat16), None, None
    else:
        rh, rl, rst = rs, None, None
    merge = bool(ch_left) and bool(ch_center) and ch_left + ch_center <= LANE
    if merge:
        side_hi = jnp.concatenate([chp_hi_ref[:], chn_hi_ref[:]], axis=0)
        side_lo = (jnp.concatenate([chp_lo_ref[:], chn_lo_ref[:]], axis=0)
                   if bf16x3 else None)

    # --- stage 2: channelize tiles p ∈ [-1, seg_tiles) from scratch ---
    # rs tile q sits at scratch cols [(q+2)·128, (q+3)·128).
    ch_tiles = []
    for p in range(-1, seg_tiles):
        base = (p + 2) * LANE
        acc = band_apply(rh, rl, rst, slice(base, base + LANE),
                         chc_hi_ref[:], chc_lo_ref[:])
        p_sl = slice(base - ch_left, base)
        n_sl = slice(base + LANE, base + LANE + ch_center)
        if merge:
            acc = acc + band_apply(rh, rl, rst, (p_sl, n_sl),
                                   side_hi, side_lo)
        else:
            if ch_left:
                acc = acc + band_apply(rh, rl, rst, p_sl,
                                       chp_hi_ref[:], chp_lo_ref[:])
            if ch_center:
                acc = acc + band_apply(rh, rl, rst, n_sl,
                                       chn_hi_ref[:], chn_lo_ref[:])
        ch_tiles.append(acc)
    ch = jnp.concatenate(ch_tiles, axis=1)  # (2C, (seg_tiles+1)·128)

    # --- stage 3: FM discriminator (split planes, shift-by-one) ---
    # ch tile p sits at scratch cols [(p+1)·128, (p+2)·128); fold f
    # owns rows [f·2C, (f+1)·2C) and output cols [f·S·128, (f+1)·S·128).
    cur = slice(LANE, LANE + seg_tiles * LANE)
    prv = slice(LANE - 1, LANE - 1 + seg_tiles * LANE)
    outs = []
    for f in range(fold):
        re_ch = ch[f * rows0 : f * rows0 + channels]
        im_ch = ch[f * rows0 + channels : (f + 1) * rows0]
        re_c, im_c = re_ch[:, cur], im_ch[:, cur]
        re_p, im_p = re_ch[:, prv], im_ch[:, prv]
        if opt == "cheap_demod":  # measurement-only: skip the atan2
            d = (im_c * re_p - re_c * im_p) * jnp.float32(inv_gain)
        else:
            d = atan2_poly(im_c * re_p - re_c * im_p,
                           re_c * re_p + im_c * im_p) * jnp.float32(inv_gain)
        # First stream sample has no predecessor → 0 (ops/demod.py).
        out_abs = ((c * fold + f) * seg_tiles * LANE
                   + jax.lax.broadcasted_iota(
                       jnp.int32, (1, seg_tiles * LANE), 1))
        outs.append(jnp.where(out_abs == 0, jnp.float32(0.0), d))
    o_ref[:] = outs[0] if fold == 1 else jnp.concatenate(outs, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("ds", "k_rows", "first_read", "ch_left", "ch_center",
                     "out_len", "channels", "seg_tiles", "inv_gain",
                     "precision", "interpret", "opt", "fold", "halo_tiles"),
)
def _chain_fused(
    x,            # (2C, T) stacked I/Q rows
    rs_bounds,    # (2,) i32 valid rs-space window [lo, hi)
    rs_planes,    # (rs_hi, rs_lo)
    ch_planes,    # (p_hi, c_hi, n_hi, p_lo, c_lo, n_lo)
    ds: int,
    k_rows: int,
    first_read: int,
    ch_left: int,
    ch_center: int,
    out_len: int,
    channels: int,
    seg_tiles: int,
    inv_gain: float,
    precision: str,
    interpret: bool,
    opt: str = "base",
    fold: int = 1,
    halo_tiles: int = 4,
):
    rows, n = x.shape
    seg_in = seg_tiles * ds
    seg_out = seg_tiles * LANE
    halo = halo_tiles * LANE
    t_in = seg_in // LANE
    grid_cols = -(-out_len // (fold * seg_out))
    hb = fold * t_in // halo_tiles  # halo blocks per program span
    main_spec = pl.BlockSpec((rows, fold * seg_in), lambda c: (0, c),
                             memory_space=pltpu.VMEM)
    left_spec = pl.BlockSpec(
        (rows, halo), lambda c: (0, jnp.maximum(c * hb - 1, 0)),
        memory_space=pltpu.VMEM)
    n_halo_blocks = -(-n // halo)
    right_spec = pl.BlockSpec(
        (rows, halo),
        lambda c: (0, jnp.minimum((c + 1) * hb, n_halo_blocks - 1)),
        memory_space=pltpu.VMEM)
    band_spec = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda c: (0, 0), memory_space=pltpu.VMEM)
    operands = list(rs_planes) + list(ch_planes)
    bounds_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(
            _chain_fused_kernel, ds=ds, k_rows=k_rows,
            first_read=first_read, ch_left=ch_left, ch_center=ch_center,
            n=n, out_len=out_len, channels=channels, seg_tiles=seg_tiles,
            inv_gain=inv_gain, precision=precision, opt=opt, fold=fold),
        grid=(grid_cols,),
        in_specs=[bounds_spec] + [band_spec(a) for a in operands] + [
            main_spec, left_spec, right_spec],
        out_specs=pl.BlockSpec((channels, fold * seg_out),
                               lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((channels, out_len), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(rs_bounds, *operands, x, x, x)


def chain_fused_supported(
    channels: int, up: int, down: int, rs_taps: int, ch_taps: int
) -> bool:
    """Whether the fused single-pass kernel covers this chain config."""
    if 128 % up or channels < 1 or 2 * channels > 256 or channels % 8:
        return False
    if ch_taps > 2 * LANE + 1:
        return False
    try:
        h_probe = np.zeros(rs_taps)
        h_probe[rs_taps // 2] = 1.0
        _, k_rows, ds, beta0, j_count = build_resample_band(
            h_probe, up, down)
    except ValueError:
        return False
    first_read = beta0 - (j_count - 1)
    if (FUSED_SEG_TILES * ds) % LANE:
        return False
    seg_in_tiles = FUSED_SEG_TILES * ds // LANE
    return _halo_tiles_for(ds, first_read, k_rows, seg_in_tiles) is not None


def chain_forward_fused(
    re,
    im,
    h_rs: np.ndarray,
    h_ch: np.ndarray,
    up: int,
    down: int,
    k_f: float,
    *,
    precision: str = "bf16x3",
    interpret: bool | None = None,
    seg_tiles: int = FUSED_SEG_TILES,
    opt: str = "base",
    fold: int = FUSED_FOLD,
    rs_bounds=None,
) -> jax.Array:
    """Run the fused chain on (C, T) I/Q rows → (C, T') message rows.

    Drop-in for the staged ``models.chain.chain_forward`` composition
    (``resample_poly`` → ``fir1d_ideal_rows_mxu`` → ``fm_demodulate``)
    when ``chain_fused_supported`` holds; callers fall back to the
    staged path otherwise.
    """
    if precision not in ("bf16x3", "highest", "bf16"):
        raise ValueError(f"unknown precision {precision!r}")
    if k_f <= 0:
        raise ValueError(f"k_f={k_f} must be > 0")
    in_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    re = jnp.asarray(re, in_dtype)
    im = jnp.asarray(im, in_dtype)
    if re.shape != im.shape or re.ndim != 2:
        raise ValueError(f"re/im must be matching (C, T) rows, got "
                         f"{re.shape} vs {im.shape}")
    channels, n = re.shape
    h_rs = np.asarray(h_rs, np.float64)
    h_ch = np.asarray(h_ch, np.float64)
    if not chain_fused_supported(channels, up, down, h_rs.size, h_ch.size):
        raise ValueError("config not supported by the fused chain kernel; "
                         "use the staged path")
    out_len, _, _, _ = _plan(n, up, down, h_rs.size)
    a, k_rows, ds, beta0, j_count = build_resample_band(h_rs, up, down)
    first_read = beta0 - (j_count - 1)
    halo_tiles = _halo_tiles_for(ds, first_read, k_rows,
                                 seg_tiles * ds // LANE)
    if halo_tiles is None:
        # chain_fused_supported guards the default seg_tiles; a custom
        # seg_tiles can still produce an indivisible superblock.
        raise ValueError(
            f"no halo width fits seg_tiles={seg_tiles} for this resample "
            f"geometry (ds={ds}, first_read={first_read}, k_rows={k_rows})")
    ap, ac, an = build_tile_band_planes_f32(h_ch)
    ch_center = h_ch.size // 2
    ch_left = h_ch.size - 1 - ch_center
    bf16x3 = precision == "bf16x3"

    def split(arr):
        arr = jnp.asarray(arr, jnp.float32)
        if bf16x3:
            return _split_bf16(arr)
        if precision == "bf16":
            # single bf16 plane; the lo operand is an unused dummy
            hi = arr.astype(jnp.bfloat16)
            return hi, jnp.zeros_like(hi)
        return arr, jnp.zeros_like(arr)

    rs_hi, rs_lo = split(a)
    chp_hi, chp_lo = split(ap)
    chc_hi, chc_lo = split(ac)
    chn_hi, chn_lo = split(an)

    # bf16 STORAGE end-to-end ("bf16"): the kernel reads half the input
    # bytes; callers holding I/Q in bf16 pay no cast at all.
    x = jnp.concatenate([re, im], axis=0)
    interp = (jax.default_backend() != "tpu") if interpret is None \
        else interpret
    if rs_bounds is None:
        rs_bounds = jnp.array([0, out_len], jnp.int32)
    else:
        rs_bounds = jnp.asarray(rs_bounds, jnp.int32)
    return _chain_fused(
        x, rs_bounds, (rs_hi, rs_lo),
        (chp_hi, chc_hi, chn_hi, chp_lo, chc_lo, chn_lo),
        ds, k_rows, first_read, ch_left, ch_center, out_len, channels,
        seg_tiles, float(1.0 / (2.0 * np.pi * k_f)), precision, interp,
        opt=opt,
        fold=max(1, min(fold, 128 // (2 * channels),
                        -(-out_len // (seg_tiles * LANE)))),
        halo_tiles=halo_tiles,
    )
