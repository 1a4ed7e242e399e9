"""MXU Pallas kernel: float32 FIR as banded matmuls (the fast model path).

The float twin of ``fir_mxu.py``: the same tri-tile band formulation
over full-row in-place blocks, with float band planes instead of int8
digit planes (no digit split, no rebias, no epilogue — the ideal model
contract is raw unclamped float, ``fir_1d_ref.py:43-65``).

Why it exists: the float *model* path previously ran either as a
VPU shifted-MAC loop (``ops/fir1d.py::fir1d_ideal_rows_jnp``, L
multiply-adds/sample) or through the FFT overlap-save kernel (~3.2
Gsps) — both far from the hardware for mid-sized taps.

Precision modes (measured on v5e, 63-tap lowpass over u8-scale data):

==========  ==========  ============  =========================
mode        Gsps        SNR vs f64    mechanism
==========  ==========  ============  =========================
"bf16x3"    76 (def.)   114 dB        operands split hi+lo bf16;
                                      3 MXU dots per band operand
                                      (hi·hi + lo·hi + hi·lo)
"highest"   39          ~f32 exact    f32 dots, Precision.HIGHEST
                                      (6-pass emulation)
==========  ==========  ============  =========================

(FFT overlap-save path: 3.7 Gsps.  The f32 memory ceiling is ~77-107
Gsps at 8 bytes/sample; "highest" is compute-serialized at half of it.)
``bf16x3`` error (~2^-21 relative) sits orders below every acceptance
bound in SURVEY.md §6 (reference SNR bounds 46-62 dB) and the sharded
FFT gate (70 dB), so it is the default for the model path; pass
``precision="highest"`` for strict f32 reproducibility.

Used by the DSP chain's channelizer (``models/chain.py``) and available
as the ``fir1d_ideal_rows_mxu`` drop-in for the jnp model path.

Wide rows (> ``MAX_FULLROW_LANES`` lane tiles) run on a grid-native
(row-block × column-superblock) kernel whose L−1 column halo rides two
one-lane-tile operands of the same array — zero staging copies (r3; the
r2 overlap-save windows paid ~4 extra HBM passes).  At the chain's
row-poor shapes (32 rows × 1.33 M) every MXU pass is fill-latency-bound,
so the wide kernel also merges the two side dots into one vstacked-band
dot when ``left + center ≤ 128`` (taps ≤ 129): measured 2.24 → 1.05 ms
for the chain's 63-tap channelize stage on v5e.
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
    MAX_FULLROW_LANES,
    MAX_TAPS,
    FULLROW_BLOCK_BYTES,
)

PRECISIONS = ("bf16x3", "highest")


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def build_tile_band_planes_f32(
    h: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tri-tile float band planes ``(a_prev, a_cur, a_next)``.

    Same row mapping as the int kernel's
    ``fir_mxu.build_tile_band_planes`` (same-mode center alignment,
    side operands trimmed to their true band width), one f32 plane.
    """
    h = np.asarray(h, dtype=np.float32)
    num_taps = h.size
    if num_taps > MAX_TAPS:
        raise ValueError(
            f"MXU kernel supports up to {MAX_TAPS} taps, got {num_taps}."
        )
    center = num_taps // 2
    left = num_taps - 1 - center
    i_idx = np.arange(LANE)[None, :]

    def band(rows: int, offset: int) -> np.ndarray:
        j_idx = np.arange(max(rows, 1))[:, None]
        k = i_idx + center + offset - j_idx
        valid = (k >= 0) & (k < num_taps)
        a = np.zeros((max(rows, 1), LANE), np.float32)
        a[valid] = h[k[valid]]
        return a

    return band(left, left), band(LANE, 0), band(center, -LANE)


def _split_bf16(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``a == hi + lo`` with both halves bf16 (hi = round(a), lo = resid)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _fir_f32_fullrow_kernel(
    a_prev_ref,  # (left, 128)
    a_cur_ref,   # (128, 128)
    a_next_ref,  # (center, 128)
    *rest,       # ["highest": ()] / ["bf16x3": lo-planes x3], body, out
    left: int,
    center: int,
    bf16x3: bool,
):
    if bf16x3:
        apl_ref, acl_ref, anl_ref, body_ref, o_ref = rest
    else:
        body_ref, o_ref = rest
    block_rows, n = body_ref.shape
    col_tiles = n // LANE
    x = body_ref[:]
    side = max(left, center)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    if bf16x3:
        xh, xl = _split_bf16(x)
        zero_side = (jnp.zeros((block_rows, side), jnp.bfloat16)
                     if side else None)

        def contrib(hs, ls, hi_ref, lo_ref):
            # bf16x3: hi·hi + lo·hi + hi·lo (the lo·lo term is ~2^-32
            # relative — below f32 resolution of the result).
            return (dot(hs, hi_ref[:]) + dot(ls, hi_ref[:])
                    + dot(hs, lo_ref[:]))

        for tl in range(col_tiles):
            s = slice(tl * LANE, (tl + 1) * LANE)
            acc = contrib(xh[:, s], xl[:, s], a_cur_ref, acl_ref)
            if left:
                ph = (zero_side[:, :left] if tl == 0 else
                      xh[:, tl * LANE - left : tl * LANE])
                plo = (zero_side[:, :left] if tl == 0 else
                       xl[:, tl * LANE - left : tl * LANE])
                acc = acc + contrib(ph, plo, a_prev_ref, apl_ref)
            if center:
                nh = (zero_side[:, :center] if tl == col_tiles - 1 else
                      xh[:, (tl + 1) * LANE : (tl + 1) * LANE + center])
                nl = (zero_side[:, :center] if tl == col_tiles - 1 else
                      xl[:, (tl + 1) * LANE : (tl + 1) * LANE + center])
                acc = acc + contrib(nh, nl, a_next_ref, anl_ref)
            o_ref[:, s] = acc
        return

    dot = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)
    zero_side = (jnp.zeros((block_rows, side), jnp.float32) if side else None)
    for tl in range(col_tiles):
        cur = x[:, tl * LANE : (tl + 1) * LANE]
        acc = dot(cur, a_cur_ref[:])
        if left:
            prev = (zero_side[:, :left] if tl == 0 else
                    x[:, tl * LANE - left : tl * LANE])
            acc = acc + dot(prev, a_prev_ref[:])
        if center:
            nxt = (zero_side[:, :center] if tl == col_tiles - 1 else
                   x[:, (tl + 1) * LANE : (tl + 1) * LANE + center])
            acc = acc + dot(nxt, a_next_ref[:])
        o_ref[:, tl * LANE : (tl + 1) * LANE] = acc


#: Column-superblock width of the wide-row grid kernel, in lane tiles.
#: 64 tiles = 8192 f32 columns; the per-superblock halo cost is
#: 2·128/8192 ≈ 3% extra reads and the unrolled tile loop stays at a
#: sane compile time.
#:
#: r4 NEGATIVE RESULT (docs/roofline.md "capped-unroll ablation"): a
#: ``lax.fori_loop``-chunked tile loop (``_fir_f32_wide_chunk_kernel``,
#: explicit ``seg_tiles``/``unroll`` knobs) was built to unlock ≥16 MB
#: DMA blocks; honest chained (no-perturbation) timing measured the
#: chunked kernel at 304 GB/s vs 369 for this fully-unrolled form, and
#: the bare two-buffer f32 copy itself at 305 GB/s for 16 MB blocks vs
#: 358 at 8 MB — r3's one-off 556 GB/s figure does not reproduce.  The
#: unrolled 64-tile superblock stays the default.
WIDE_SEG_TILES = 64

#: Tiles statically unrolled per fori_loop chunk of the (non-default)
#: chunked wide kernels.
WIDE_UNROLL_TILES = 64

#: Main-block VMEM budget of the wide grid kernels.  Larger than the
#: narrow kernel's ``FULLROW_BLOCK_BYTES``: each MXU pass streams only
#: ``block_rows`` rows, so row-poor blocks are fill-latency-bound —
#: 4 MB lets ``block_rows`` reach the full 128 MXU rows at the default
#: superblock width (total VMEM per program ≈ 16 MB with the bf16
#: splits, well under the 100 MB limit).
WIDE_BLOCK_BYTES = 4 * 1024 * 1024


def _fir_f32_wide_kernel(
    a_prev_ref,  # (left, 128)
    a_cur_ref,   # (128, 128)
    a_next_ref,  # (center, 128)
    *rest,       # ["bf16x3": lo-planes x3], x_main, x_prev, x_next, out
    left: int,
    center: int,
    bf16x3: bool,
    n: int,
    seg: int,
    grid_cols: int,
):
    """One (row-block × column-superblock) program of the wide kernel.

    The r3 wide-row redesign: instead of materializing overlapping
    windows (pad → slice-concat → kernel → slice-concat ≈ 4 extra HBM
    passes, the whole gap between the chain channelizer's measured 19
    Gsps and its 81 Gsps f32 roofline), the grid walks column
    superblocks of the *original* array and the L−1 column halo rides
    two one-lane-tile operands of the same array (previous block's tail
    tile, next block's head tile — the 2-D kernel's row-halo idea,
    ``fir2d_mxu.py``, turned sideways).  Stream edges and the ragged
    row tail are realized in-kernel: tiles whose absolute column ≥ n
    are zeroed (the same-mode zero-pad contract), so the input needs no
    padding pass at all.
    """
    if bf16x3:
        apl_ref, acl_ref, anl_ref, xm_ref, xp_ref, xn_ref, o_ref = rest
    else:
        xm_ref, xp_ref, xn_ref, o_ref = rest
    c = pl.program_id(1)
    block_rows = xm_ref.shape[0]
    col_tiles = seg // LANE
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    x = xm_ref[:]
    if n % seg:
        # Ragged tail: zero garbage columns past the true row length
        # (only the last superblock has any; the select elsewhere is a
        # compare against an always-true bound, fused into the load).
        col_abs = c * seg + jax.lax.broadcasted_iota(
            jnp.int32, (1, seg), 1)
        x = jnp.where(col_abs < n, x, jnp.float32(0.0))
    prev_t = None
    if left:
        # Previous superblock's tail tile; zeros at the stream head
        # (block 0's index map clamps to tile 0 — garbage, masked here).
        prev_t = jnp.where(c == 0, jnp.float32(0.0),
                           xp_ref[:, LANE - left:])
    next_t = None
    if center:
        # Next superblock's head tile; zeros at the stream tail and in
        # the ragged region (clamped index map ⇒ garbage, masked here).
        nxt_abs = (c + 1) * seg + jax.lax.broadcasted_iota(
            jnp.int32, (1, center), 1)
        next_t = jnp.where((c < grid_cols - 1) & (nxt_abs < n),
                           xn_ref[:, :center], jnp.float32(0.0))

    # Side-dot merge: when both halo bands fit one contraction tile
    # (left + center ≤ 128, i.e. taps ≤ 129), fold the prev and next
    # contributions into ONE dot against the vstacked side band —
    # [prev_win | next_win] @ [[A_prev], [A_next]].  Each MXU pass at
    # the chain's M = 32 rows is fill-latency-bound (cost is
    # K-independent up to 128), so 2 dots/tile instead of 3 buys ~1.5×
    # on compute-bound row-poor workloads.
    merge_sides = bool(left) and bool(center) and left + center <= LANE

    if bf16x3:
        xh, xl = _split_bf16(x)
        ph, pl_ = _split_bf16(prev_t) if left else (None, None)
        nh, nl = _split_bf16(next_t) if center else (None, None)

        def contrib(hs, ls, hi, lo):
            return dot(hs, hi) + dot(ls, hi) + dot(hs, lo)

        a_side_hi = a_side_lo = None
        if merge_sides:
            a_side_hi = jnp.concatenate(
                [a_prev_ref[:], a_next_ref[:]], axis=0)
            a_side_lo = jnp.concatenate([apl_ref[:], anl_ref[:]], axis=0)

        for tl in range(col_tiles):
            s = slice(tl * LANE, (tl + 1) * LANE)
            acc = contrib(xh[:, s], xl[:, s], a_cur_ref[:], acl_ref[:])
            p_hi = p_lo = n_hi = n_lo = None
            if left:
                p_hi = ph if tl == 0 else xh[:, tl * LANE - left: tl * LANE]
                p_lo = pl_ if tl == 0 else xl[:, tl * LANE - left: tl * LANE]
            if center:
                n_hi = (nh if tl == col_tiles - 1 else
                        xh[:, (tl + 1) * LANE: (tl + 1) * LANE + center])
                n_lo = (nl if tl == col_tiles - 1 else
                        xl[:, (tl + 1) * LANE: (tl + 1) * LANE + center])
            if merge_sides:
                s_hi = jnp.concatenate([p_hi, n_hi], axis=1)
                s_lo = jnp.concatenate([p_lo, n_lo], axis=1)
                acc = acc + contrib(s_hi, s_lo, a_side_hi, a_side_lo)
            else:
                if left:
                    acc = acc + contrib(p_hi, p_lo, a_prev_ref[:],
                                        apl_ref[:])
                if center:
                    acc = acc + contrib(n_hi, n_lo, a_next_ref[:],
                                        anl_ref[:])
            o_ref[:, s] = acc
        return

    dot = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)
    a_side = (jnp.concatenate([a_prev_ref[:], a_next_ref[:]], axis=0)
              if merge_sides else None)
    for tl in range(col_tiles):
        s = slice(tl * LANE, (tl + 1) * LANE)
        acc = dot(x[:, s], a_cur_ref[:])
        prev = nxt = None
        if left:
            prev = (prev_t if tl == 0 else
                    x[:, tl * LANE - left: tl * LANE])
        if center:
            nxt = (next_t if tl == col_tiles - 1 else
                   x[:, (tl + 1) * LANE: (tl + 1) * LANE + center])
        if merge_sides:
            acc = acc + dot(jnp.concatenate([prev, nxt], axis=1), a_side)
        else:
            if left:
                acc = acc + dot(prev, a_prev_ref[:])
            if center:
                acc = acc + dot(nxt, a_next_ref[:])
        o_ref[:, s] = acc


def _fir_f32_wide_chunk_kernel(
    a_prev_ref,  # (left, 128)
    a_cur_ref,   # (128, 128)
    a_next_ref,  # (center, 128)
    *rest,       # ["bf16x3": lo-planes x3], x_main, x_prev, x_next, out
    left: int,
    center: int,
    bf16x3: bool,
    n: int,
    seg: int,
    unroll: int,
):
    """Capped-unroll wide program: fori_loop over ``unroll``-tile chunks.

    The r4 structural experiment against the f32 streaming wall
    (VERDICT r3 task 1): a ``lax.fori_loop`` whose chunk loads
    (``unroll`` lane tiles + one halo tile each side) and stores sit at
    lane-tile-aligned dynamic offsets (``pl.multiple_of`` proofs keep
    Mosaic from rejecting/relaying them), while the misaligned
    tap-window slicing stays *static* inside the chunk — capping compile
    time so the superblock (= DMA block) can grow past 8 MB.

    MEASURED NEGATIVE RESULT (kept as an explicit knob only): honest
    chained timing on v5e puts this form at 304 GB/s vs 369 for the
    fully-unrolled 64-tile kernel, and ≥16 MB DMA blocks are slower
    than 8 MB even for a bare copy (305 vs 358 GB/s) — see
    docs/roofline.md "capped-unroll ablation".  Stream edges, the
    superblock halo tiles, and the ragged tail are realized exactly as
    in ``_fir_f32_wide_kernel``.
    """
    if bf16x3:
        apl_ref, acl_ref, anl_ref, xm_ref, xp_ref, xn_ref, o_ref = rest
    else:
        xm_ref, xp_ref, xn_ref, o_ref = rest
    c = pl.program_id(1)
    cw = unroll * LANE
    n_chunks = seg // cw
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if not bf16x3:
        dot = functools.partial(dot, precision=jax.lax.Precision.HIGHEST)

    # Superblock-edge halo tiles (same masking as the unrolled kernel).
    prev_sb = None
    if left:
        prev_sb = jnp.where(c == 0, jnp.float32(0.0),
                            xp_ref[:, LANE - left:])
    next_sb = None
    if center:
        nxt_abs = (c + 1) * seg + jax.lax.broadcasted_iota(
            jnp.int32, (1, center), 1)
        next_sb = jnp.where(nxt_abs < n, xn_ref[:, :center], jnp.float32(0.0))

    merge_sides = bool(left) and bool(center) and left + center <= LANE
    if merge_sides:
        a_side_hi = jnp.concatenate([a_prev_ref[:], a_next_ref[:]], axis=0)
        a_side_lo = (jnp.concatenate([apl_ref[:], anl_ref[:]], axis=0)
                     if bf16x3 else None)

    def chunk(i, _):
        # pl.multiple_of: Mosaic must statically prove lane-tile
        # alignment of dynamic offsets (it cannot see through the
        # multiply or the clamps), else it rejects the vector loads.
        base = pl.multiple_of(i * cw, LANE)
        mid = xm_ref[:, pl.ds(base, cw)]
        col_abs = c * seg + base + jax.lax.broadcasted_iota(
            jnp.int32, (1, cw), 1)
        mid = jnp.where(col_abs < n, mid, jnp.float32(0.0))
        lt = rt = None
        if left:
            # Chunk 0 takes the previous superblock's tail; interior
            # chunks read their left-neighbour tile (lane-aligned load;
            # garbage past n only feeds discarded outputs).
            lt_off = pl.multiple_of(jnp.maximum(base - LANE, 0), LANE)
            lt_raw = xm_ref[:, pl.ds(lt_off, LANE)]
            lt = jnp.where(i == 0, prev_sb, lt_raw[:, LANE - left:])
        if center:
            rt_off = pl.multiple_of(jnp.minimum(base + cw, seg - LANE),
                                    LANE)
            rt_raw = xm_ref[:, pl.ds(rt_off, LANE)][:, :center]
            rt_abs = c * seg + base + cw + jax.lax.broadcasted_iota(
                jnp.int32, (1, center), 1)
            rt = jnp.where(i == n_chunks - 1, next_sb,
                           jnp.where(rt_abs < n, rt_raw, jnp.float32(0.0)))

        if bf16x3:
            mh, ml = _split_bf16(mid)
            lh, ll = _split_bf16(lt) if left else (None, None)
            rh, rl = _split_bf16(rt) if center else (None, None)

            def contrib(hs, ls, hi, lo):
                return dot(hs, hi) + dot(ls, hi) + dot(hs, lo)

            accs = []
            for tl in range(unroll):
                s = slice(tl * LANE, (tl + 1) * LANE)
                acc = contrib(mh[:, s], ml[:, s], a_cur_ref[:], acl_ref[:])
                p_hi = p_lo = n_hi = n_lo = None
                if left:
                    p_hi = (lh if tl == 0 else
                            mh[:, tl * LANE - left: tl * LANE])
                    p_lo = (ll if tl == 0 else
                            ml[:, tl * LANE - left: tl * LANE])
                if center:
                    n_hi = (rh if tl == unroll - 1 else
                            mh[:, (tl + 1) * LANE: (tl + 1) * LANE + center])
                    n_lo = (rl if tl == unroll - 1 else
                            ml[:, (tl + 1) * LANE: (tl + 1) * LANE + center])
                if merge_sides:
                    s_hi = jnp.concatenate([p_hi, n_hi], axis=1)
                    s_lo = jnp.concatenate([p_lo, n_lo], axis=1)
                    acc = acc + contrib(s_hi, s_lo, a_side_hi, a_side_lo)
                else:
                    if left:
                        acc = acc + contrib(p_hi, p_lo, a_prev_ref[:],
                                            apl_ref[:])
                    if center:
                        acc = acc + contrib(n_hi, n_lo, a_next_ref[:],
                                            anl_ref[:])
                accs.append(acc)
            o_ref[:, pl.ds(base, cw)] = jnp.concatenate(accs, axis=1)
            return 0

        accs = []
        for tl in range(unroll):
            acc = dot(mid[:, tl * LANE: (tl + 1) * LANE], a_cur_ref[:])
            prev = nxt = None
            if left:
                prev = (lt if tl == 0 else
                        mid[:, tl * LANE - left: tl * LANE])
            if center:
                nxt = (rt if tl == unroll - 1 else
                       mid[:, (tl + 1) * LANE: (tl + 1) * LANE + center])
            if merge_sides:
                acc = acc + dot(jnp.concatenate([prev, nxt], axis=1),
                                a_side_hi)
            else:
                if left:
                    acc = acc + dot(prev, a_prev_ref[:])
                if center:
                    acc = acc + dot(nxt, a_next_ref[:])
            accs.append(acc)
        o_ref[:, pl.ds(base, cw)] = jnp.concatenate(accs, axis=1)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


@functools.partial(
    jax.jit,
    static_argnames=("left", "center", "block_rows", "bf16x3", "interpret",
                     "seg_tiles", "unroll"),
)
def _fir_f32_wide(x, planes, left, center, block_rows, bf16x3, interpret,
                  seg_tiles=WIDE_SEG_TILES, unroll=WIDE_UNROLL_TILES):
    """Grid-native wide-row launch: (row blocks × column superblocks)."""
    batch, n = x.shape
    seg = seg_tiles * LANE
    grid_rows = -(-batch // block_rows)
    grid_cols = -(-n // seg)
    n_tiles = -(-n // LANE)
    main_spec = pl.BlockSpec((block_rows, seg), lambda r, c: (r, c),
                             memory_space=pltpu.VMEM)
    prev_spec = pl.BlockSpec(
        (block_rows, LANE),
        lambda r, c: (r, jnp.maximum(c * seg_tiles - 1, 0)),
        memory_space=pltpu.VMEM)
    next_spec = pl.BlockSpec(
        (block_rows, LANE),
        lambda r, c: (r, jnp.minimum((c + 1) * seg_tiles,
                                     n_tiles - 1)),
        memory_space=pltpu.VMEM)
    plane_spec = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda r, c: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [plane_spec(a) for a in planes] + [
        main_spec, prev_spec, next_spec]
    if unroll < seg_tiles:
        if seg_tiles % unroll:
            raise ValueError(
                f"unroll={unroll} must divide seg_tiles={seg_tiles}")
        body = functools.partial(
            _fir_f32_wide_chunk_kernel, left=left, center=center,
            bf16x3=bf16x3, n=n, seg=seg, unroll=unroll)
    else:
        body = functools.partial(
            _fir_f32_wide_kernel, left=left, center=center, bf16x3=bf16x3,
            n=n, seg=seg, grid_cols=grid_cols)
    return pl.pallas_call(
        body,
        grid=(grid_rows, grid_cols),
        in_specs=in_specs,
        out_specs=main_spec,
        out_shape=jax.ShapeDtypeStruct((batch, n), jnp.float32),
        # NOT aliased in place: superblock c+1 reads block c's tail tile
        # as its halo, which an in-place write would have clobbered
        # (same argument as the 2-D kernel's row halo, fir2d_mxu.py).
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*planes, x, x, x)


@functools.partial(
    jax.jit,
    static_argnames=("left", "center", "block_rows", "bf16x3", "interpret"),
)
def _fir_f32_fullrow(x, planes, left, center, block_rows, bf16x3, interpret):
    batch, n = x.shape
    row_spec = pl.BlockSpec((block_rows, n), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    plane_spec = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda r: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [plane_spec(a) for a in planes] + [row_spec]
    return pl.pallas_call(
        functools.partial(_fir_f32_fullrow_kernel, left=left, center=center,
                          bf16x3=bf16x3),
        grid=(-(-batch // block_rows),),
        in_specs=in_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((batch, n), jnp.float32),
        # Rows are independent: in-place is race-free, and the alias
        # keeps chained/streaming callers free of XLA's per-iteration
        # loop copy (fir_mxu.py module docstring).
        input_output_aliases={len(planes): 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*planes, x)


def fir1d_ideal_rows_mxu(
    x,
    h,
    *,
    precision: str = "bf16x3",
    block_rows: int | None = None,
    interpret: bool | None = None,
    seg_tiles: int | None = None,
    unroll: int | None = None,
) -> jax.Array:
    """Float32 same-mode FIR over (B, N) rows on the MXU.

    Drop-in for ``ops.fir1d.fir1d_ideal_rows_jnp`` (raw unclamped f32,
    zero-padded same-mode, ``fir_1d_ref.py:43-65`` contract) at MXU
    speed.  Accepts uint8 or float input.  ``precision`` selects the
    module-docstring trade ("bf16x3" ≈114 dB SNR default, "highest" =
    strict f32).  Rows wider than ``MAX_FULLROW_LANES`` lane tiles (f32
    VMEM budget) fall back to the jnp shifted-MAC path.
    """
    if precision not in PRECISIONS:
        raise ValueError(
            f"precision must be one of {PRECISIONS}, got {precision!r}"
        )
    h = np.asarray(h, dtype=np.float64)
    num_taps = int(h.size)
    x_f32 = jnp.asarray(x, dtype=jnp.float32)
    batch, n = x_f32.shape
    lanes = max(1, _round_up(n, LANE) // LANE)
    if num_taps > MAX_TAPS:
        from warmup_fir_filter_tpu.ops.fir1d import fir1d_ideal_rows_jnp

        return fir1d_ideal_rows_jnp(x, h)
    if lanes > MAX_FULLROW_LANES:
        # Wide rows: grid-native column superblocks with one-tile halo
        # operands — zero staging copies (r3; the r2 overlap-save
        # windows paid ~4 extra HBM passes in pad/concat relayouts).
        a_prev, a_cur, a_next = build_tile_band_planes_f32(h)
        center = num_taps // 2
        left = num_taps - 1 - center
        if unroll is None:
            unroll = WIDE_UNROLL_TILES
        if seg_tiles is None:
            # Shrink the superblock to the row when rows are short; the
            # chunked loop masks nothing extra because seg_tiles is
            # rounded to whole chunks.
            seg_tiles = min(WIDE_SEG_TILES,
                            _round_up(lanes, unroll))
        seg = seg_tiles * LANE
        if block_rows is None:
            by_vmem = max(1, WIDE_BLOCK_BYTES // (4 * seg))
            block_rows = int(min(_round_up(max(batch, 1), 8),
                                 _round_up(by_vmem, 8)))
        bf16x3 = precision == "bf16x3"
        plane_arrays = [jnp.asarray(a) for a in (a_prev, a_cur, a_next)]
        if bf16x3:
            his, los = [], []
            for a in plane_arrays:
                hi, lo = _split_bf16(a)
                his.append(hi)
                los.append(lo)
            planes = tuple(his) + tuple(los)
        else:
            planes = tuple(plane_arrays)
        return _fir_f32_wide(
            x_f32, planes, left, center, block_rows, bf16x3,
            (jax.default_backend() != "tpu") if interpret is None
            else interpret,
            seg_tiles=seg_tiles, unroll=min(unroll, seg_tiles),
        )

    a_prev, a_cur, a_next = build_tile_band_planes_f32(h)
    center = num_taps // 2
    left = num_taps - 1 - center
    n_pad = lanes * LANE
    if block_rows is None:
        by_vmem = max(1, FULLROW_BLOCK_BYTES // (4 * n_pad))
        block_rows = int(min(_round_up(max(batch, 1), 8),
                             _round_up(by_vmem, 8)))
    if n_pad != n:
        x_f32 = jnp.pad(x_f32, ((0, 0), (0, n_pad - n)))

    bf16x3 = precision == "bf16x3"
    plane_arrays = []
    for a in (a_prev, a_cur, a_next):
        plane_arrays.append(jnp.asarray(a))
    if bf16x3:
        his, los = [], []
        for a in plane_arrays:
            hi, lo = _split_bf16(a)
            his.append(hi)
            los.append(lo)
        planes = tuple(his) + tuple(los)
    else:
        planes = tuple(plane_arrays)

    out = _fir_f32_fullrow(
        x_f32,
        planes,
        left,
        center,
        block_rows,
        bf16x3,
        (jax.default_backend() != "tpu") if interpret is None else interpret,
    )
    return out if n_pad == n else out[:, :n]
