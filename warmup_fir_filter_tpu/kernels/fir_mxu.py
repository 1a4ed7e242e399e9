"""MXU Pallas kernel: fixed-point FIR as banded int8 systolic matmuls.

The speed-of-light formulation (SURVEY.md §7.3 item 2).  The VPU
shifted-MAC kernel (``fir_pallas.py``) is *compute*-bound (~L·4 VPU ops
per sample); this kernel moves the MACs onto the 128×128 int8 MXU so the
FIR becomes *memory*-bound — the true roofline for a 2-bytes-per-sample
op.

Formulation — **tri-tile band matmuls over full-row blocks, in place**
----------------------------------------------------------------------
Split each output row into 128-sample lane tiles.  Output tile ``p``
only reads input tiles ``p-1``, ``p``, ``p+1`` (requires ``L ≤ 257``):

    Y_p = X_{p-1}[:, -left:] @ A⁻  +  X_p @ A⁰  +  X_{p+1}[:, :center] @ A⁺

with ``center = L // 2``, ``left = L - 1 - center`` and the banded
transfer matrices of :func:`build_tile_band_planes`.  The side operands
are trimmed to their true band width (K = ``left`` / ``center``), so
each digit costs ``128 + L - 1`` MACs/sample.

**The hot path uses full-row blocks aliased in place** (r2 redesign):
each program owns ``(BR, N)`` complete rows, every halo is an
in-register slice (tile 0 / tile C-1 take zero sides), and the input
operand is declared ``input_output_aliases`` with the output.  The
aliasing is what buys the 2×: without it, XLA inserts a *full-array
copy before the kernel on every iteration of any loop that chains the
FIR* (the while-loop carry cannot alias an unaliased custom call's
output — observed as ``%copy.10 = u8[19456,8192] copy(...)`` feeding
``tpu_custom_call`` in the compiled HLO, 320 MB of extra traffic per
apply).  Measured on v5e: 158 Gsps with the copy, **320 Gsps without**
(78% of the 409.5 Gsps HBM speed of light; a bare in-place Pallas copy
measures 328 and XLA's fused elementwise passes 306-340).  Because rows
are independent, in-place is race-free: each block is fully fetched to
VMEM before its write-back.  Callers' buffers are never clobbered —
at a jit boundary XLA inserts one defensive copy unless the caller
donates; inside jit/scan chains the alias is free.

Rows too wide for a VMEM-resident block (> ``MAX_FULLROW_LANES`` lane
tiles) fall back to the original column-split kernel: output-aligned
``(BR, C·128)`` body blocks with separately-DMA'd halo lane tiles,
clamped BlockSpec indices, and in-register AND-gating for the row-edge
zero pad (no aliasing possible there — an output block would need the
previous block's already-overwritten tail).

Exactness on the int8 MXU is obtained by two exact encodings:

- **Coefficients**: signed base-256 digit decomposition
  ``h = Σ_b 256^b · s_b`` with each digit ``s_b ∈ [-128, 127]`` (int8).
  Every digit yields one stacked tri-tile band plane; the kernel
  accumulates ``Σ_b 256^b · (X @ A_b)`` in int32, which wraps mod 2^32
  exactly like the golden contract.
- **Samples**: uint8 pixels are re-biased to ``x̃ = x - 128 ∈ int8``
  *inside* the kernel (no extra HBM traffic); the constant correction
  ``128 · Σ_k h_fixed[k]`` is added back into the accumulator.  Zero
  padding stays exact because a padded 0 becomes ``x̃ = -128`` whose
  +128 bias restores the zero contribution.

Each 128-lane output tile costs ``D`` int8 matmuls totalling
``K = 128 + L - 1`` rows (132 for the 5-tap banks, up to 384 at the
tri-tile L=257 limit; D = digit count, 1 for the Q4.12 filter banks
whose fixed coefficients are multiples of 256) = K·D MACs/sample — far
below the v5e MXU's ~394 TOPS, leaving HBM bandwidth as the only wall.
Replaces the reference's scalar-interpreted hot loop
(``fir_1d_fixed_ref.py:95-128``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warmup_fir_filter_tpu.ops.qformat import QFormat

LANE = 128
DEFAULT_BLOCK_ROWS = 512
DEFAULT_COL_TILES = 32  # fallback: output tiles/program; halo ×(C+2)/C
MAX_TAPS = 2 * LANE + 1          # tri-tile band limit (this kernel)
MAX_TAPS_TWO_TILE = LANE + 1     # two-tile [A0; A1] limit
#: Windowed-band kernel tap limit: bounded by the VMEM band operand
#: (≈ D·(L+127)·128 bytes) and by MXU MACs/sample = D·(L+127) staying a
#: sane multiple of the memory roofline.
MAX_TAPS_WINDOWED = 4096

#: Full-row hot path: row width limit in lane tiles.  A block is
#: ``BR × lanes·128`` bytes; at the 32-sublane u8 minimum BR this caps a
#: block at 32·256·128 = 1 MB, comfortably double-buffered in VMEM.
MAX_FULLROW_LANES = 256
#: Target VMEM bytes per (input) block on the full-row path.
FULLROW_BLOCK_BYTES = 2 * 1024 * 1024


def signed_base256_digits(values: np.ndarray) -> np.ndarray:
    """Exact signed-digit base-256 decomposition.

    Returns (D, L) int8 with ``values == Σ_b 256^b · digits[b]``; D is the
    minimal digit count covering all entries.
    """
    rem = np.asarray(values, dtype=np.int64).copy()
    digits = []
    while np.any(rem != 0):
        d = ((rem + 128) & 255) - 128
        digits.append(d.astype(np.int8))
        rem = (rem - d) >> 8
    if not digits:
        digits.append(np.zeros(rem.shape, np.int8))
    return np.stack(digits)


def factor_pow2(values: np.ndarray) -> tuple[np.ndarray, int]:
    """Factor the common power of two: ``values == reduced << s``.

    Digit planes cost one MXU pass each, so scale factors hiding in the
    quantized coefficients are pure waste: e.g. the Q4.12 5×5 Gaussian's
    values are all multiples of 16, and ``h >> 4`` fits one int8 digit
    plane where the raw values need two.  The shift folds into the
    plane's accumulation exponent (exact in mod-2^32 arithmetic).
    """
    values = np.asarray(values, dtype=np.int64)
    nonzero = values[values != 0]
    if nonzero.size == 0:
        return values, 0
    s = min(int(v & -v).bit_length() - 1 for v in np.abs(nonzero))
    return values >> s, s


def build_band_matrices(h_fixed: np.ndarray) -> tuple[np.ndarray, tuple[int, ...]]:
    """Two-tile stacked digit-split banded transfer matrices.

    Returns ``(stacked, exponents)`` where ``stacked`` is
    ``(D_kept, 128 + L - 1, 128)`` int8 — for each *non-zero* digit plane
    ``b``, rows 0..127 hold ``A0_b[j, i] = digit_b[i + L - 1 - j]``
    (current input tile, **left-halo-aligned**: the caller supplies input
    shifted left by ``L-1-center``) and the remaining ``L-1`` rows hold
    ``A1_b`` (the band's spill into the next tile).  ``exponents`` are
    the accumulation **bit shifts** of the kept planes (``8·byte + s``
    with the common power-of-two ``s`` factored out by
    :func:`factor_pow2`; all-zero planes cost nothing).

    Kept as the minimal pre-padded-input band formulation (unit-tested
    reference for the plane constructions); the 1-D kernel below uses
    the no-pad tri-tile planes, and the 2-D kernel builds per-tap-row
    tri-tile planes (``fir2d_mxu.build_tile_band_planes_2d``).
    """
    h_fixed = np.asarray(h_fixed, dtype=np.int64)
    num_taps = h_fixed.size
    if num_taps > MAX_TAPS_TWO_TILE:
        raise ValueError(
            f"two-tile band supports up to {MAX_TAPS_TWO_TILE} taps, "
            f"got {num_taps}."
        )
    reduced, pow2 = factor_pow2(h_fixed)
    digits = signed_base256_digits(reduced)  # (D, L)
    j_idx = np.arange(LANE)[:, None]  # input position within tile
    i_idx = np.arange(LANE)[None, :]  # output position within tile
    k0 = i_idx + (num_taps - 1) - j_idx
    k1 = k0 - LANE
    m0 = (k0 >= 0) & (k0 < num_taps)
    m1 = (k1 >= 0) & (k1 < num_taps)
    # A1[j, i] is nonzero only for j < L - 1 (the band's spill), so the
    # stacked operand needs only K = 128 + L - 1 rows.
    spill = max(num_taps - 1, 1)
    planes = []
    exponents = []
    for b in range(digits.shape[0]):
        if not np.any(digits[b]):
            continue
        a = np.zeros((LANE + spill, LANE), np.int8)
        a[:LANE][m0] = digits[b][k0[m0]]
        a[LANE:][m1[:spill]] = digits[b][k1[:spill][m1[:spill]]]
        planes.append(a)
        exponents.append(8 * b + pow2)
    if not planes:  # all-zero filter
        planes.append(np.zeros((LANE + spill, LANE), np.int8))
        exponents.append(0)
    return np.stack(planes), tuple(exponents)


def build_tile_band_planes(
    h_fixed: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, tuple[int, ...]]:
    """Tri-tile (no-pad) stacked digit band planes, side-trimmed.

    Returns ``(a_prev, a_cur, a_next, exponents)`` where for each kept
    digit plane ``b`` (with ``center = L // 2``, ``left = L - 1 - center``)

    - ``a_cur[b][j, i]  = digit_b[i + center - j]``        (K = 128),
    - ``a_prev[b][j, i] = digit_b[i + center + left - j]`` (K = left —
      the last ``left`` columns of the *previous* lane tile),
    - ``a_next[b][j, i] = digit_b[i + center - 128 - j]``  (K = center —
      the first ``center`` columns of the *next* lane tile),

    all zero outside ``0 ≤ k < L``.  Trimming the side operands to their
    true band width keeps the MXU work at ``128 + L - 1`` MACs/sample —
    an untrimmed 3·128-row formulation tripled MXU traffic and became
    compute-bound (measured 157 Gsps vs the ~320 Gsps memory wall).
    The row mapping matches the same-mode center alignment of the golden
    contract (``/root/reference`` ``fir_1d_fixed_ref.py:95-107``:
    acc over ``x[n - k + L//2]``).
    """
    h_fixed = np.asarray(h_fixed, dtype=np.int64)
    num_taps = h_fixed.size
    if num_taps > MAX_TAPS:
        raise ValueError(
            f"MXU kernel supports up to {MAX_TAPS} taps, got {num_taps}."
        )
    center = num_taps // 2
    left = num_taps - 1 - center
    reduced, pow2 = factor_pow2(h_fixed)
    digits = signed_base256_digits(reduced)  # (D, L)
    i_idx = np.arange(LANE)[None, :]

    def band(rows: int, offset: int, digit: np.ndarray) -> np.ndarray:
        # a[j, i] = digit[i + center + offset - j], rows k-validity-masked.
        j_idx = np.arange(max(rows, 1))[:, None]
        k = i_idx + center + offset - j_idx
        valid = (k >= 0) & (k < num_taps)
        a = np.zeros((max(rows, 1), LANE), np.int8)
        a[valid] = digit[k[valid]]
        return a

    prev_planes, cur_planes, next_planes = [], [], []
    exponents = []
    for b in range(digits.shape[0]):
        if not np.any(digits[b]):
            continue
        prev_planes.append(band(left, left, digits[b]))
        cur_planes.append(band(LANE, 0, digits[b]))
        next_planes.append(band(center, -LANE, digits[b]))
        exponents.append(8 * b + pow2)
    if not exponents:  # all-zero filter
        prev_planes.append(band(left, left, digits[0] * 0))
        cur_planes.append(band(LANE, 0, digits[0] * 0))
        next_planes.append(band(center, -LANE, digits[0] * 0))
        exponents.append(0)
    return (
        np.stack(prev_planes),
        np.stack(cur_planes),
        np.stack(next_planes),
        tuple(exponents),
    )


def _fir_mxu_fullrow_kernel(
    bias_ref,    # (1, 1) int32 in SMEM: 128·Σ h_fixed (+ rounding, fast path)
    a_prev_ref,  # (D_kept, left, 128) int8: previous-tile band planes
    a_cur_ref,   # (D_kept, 128, 128) int8: current-tile band planes
    a_next_ref,  # (D_kept, center, 128) int8: next-tile band planes
    body_ref,    # (BR, N) uint8: full rows (aliased with the output)
    o_ref,       # (BR, N) uint8 output
    *,
    exponents: tuple[int, ...],
    frac_bits: int,
    acc_bits: int,
    needs_wrap: bool,
    left: int,
    center: int,
):
    bias = bias_ref[0, 0]
    block_rows, n = body_ref.shape
    col_tiles = n // LANE

    # Re-bias uint8 → int8: x - 128 ≡ x XOR 0x80 reinterpreted as int8.
    x_body = pltpu.bitcast(body_ref[:] ^ jnp.uint8(0x80), jnp.int8)
    # Zero-pad sides for the first/last lane tile: u8 0 re-biases to -128,
    # whose +128·Σh bias contribution restores an exact zero.
    side = max(left, center)
    zero_side = (jnp.full((block_rows, side), -128, jnp.int8)
                 if side else None)

    for tl in range(col_tiles):
        cur = x_body[:, tl * LANE : (tl + 1) * LANE]
        if left:
            prev = (zero_side[:, :left] if tl == 0 else
                    x_body[:, tl * LANE - left : tl * LANE])
        if center:
            nxt = (zero_side[:, :center] if tl == col_tiles - 1 else
                   x_body[:, (tl + 1) * LANE : (tl + 1) * LANE + center])
        acc = jnp.full((block_rows, LANE), bias, jnp.int32)
        for plane, b in enumerate(exponents):
            prod = jnp.dot(cur, a_cur_ref[plane],
                           preferred_element_type=jnp.int32)
            if left:
                prod = prod + jnp.dot(prev, a_prev_ref[plane],
                                      preferred_element_type=jnp.int32)
            if center:
                prod = prod + jnp.dot(nxt, a_next_ref[plane],
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

        o_ref[:, tl * LANE : (tl + 1) * LANE] = (
            jnp.clip(final, 0, 255).astype(jnp.uint8)
        )


@functools.partial(
    jax.jit,
    static_argnames=("exponents", "frac_bits", "acc_bits", "block_rows",
                     "needs_wrap", "left", "center", "interpret"),
)
def _fir_mxu_fullrow(
    x,       # (B, N) uint8, N a multiple of 128
    a_prev,  # (D_kept, max(left,1), 128) int8 side band planes
    a_cur,   # (D_kept, 128, 128) int8 current-tile band planes
    a_next,  # (D_kept, max(center,1), 128) int8 side band planes
    bias,    # (1, 1) int32
    exponents: tuple,
    frac_bits: int,
    acc_bits: int,
    block_rows: int,
    needs_wrap: bool,
    left: int,
    center: int,
    interpret: bool,
):
    batch, n = x.shape
    grid = (-(-batch // block_rows),)
    row_spec = pl.BlockSpec((block_rows, n), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda r: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(a_prev.shape, lambda r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(a_cur.shape, lambda r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(a_next.shape, lambda r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        row_spec,
    ]
    kernel = functools.partial(
        _fir_mxu_fullrow_kernel,
        exponents=exponents,
        frac_bits=frac_bits,
        acc_bits=acc_bits,
        needs_wrap=needs_wrap,
        left=left,
        center=center,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((batch, n), jnp.uint8),
        # In-place update: rows are independent, each block is fully
        # fetched before its write-back, and the alias removes the
        # per-iteration full-array copy XLA otherwise inserts when the
        # kernel is chained in a loop (see module docstring).
        input_output_aliases={4: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(bias, a_prev, a_cur, a_next, x)


def _fir_mxu_kernel(
    bias_ref,    # (1, 1) int32 in SMEM: 128·Σ h_fixed (+ rounding, fast path)
    a_prev_ref,  # (D_kept, left, 128) int8: previous-tile band planes
    a_cur_ref,   # (D_kept, 128, 128) int8: current-tile band planes
    a_next_ref,  # (D_kept, center, 128) int8: next-tile band planes
    head_ref,    # (BR, 128) uint8: lane tile just left of the body block
    body_ref,    # (BR, C·128) uint8: raw input tiles (output-aligned)
    tail_ref,    # (BR, 128) uint8: lane tile just right of the body block
    o_ref,       # (BR, C·128) uint8 output
    *,
    exponents: tuple[int, ...],
    col_tiles: int,
    frac_bits: int,
    acc_bits: int,
    needs_wrap: bool,
    left: int,
    center: int,
):
    t = pl.program_id(1)
    last_t = pl.num_programs(1) - 1
    bias = bias_ref[0, 0]
    block_rows = body_ref.shape[0]

    # Re-bias uint8 → int8: x - 128 ≡ x XOR 0x80 reinterpreted as int8
    # (two cheap VPU ops per byte, no widening).  Gated-out halo tiles
    # are forced to u8 0 BEFORE the rebias so they contribute x̃ = -128,
    # which the +128·Σh bias restores to an exact zero-pad.
    def _rebias(u8):
        return pltpu.bitcast(u8 ^ jnp.uint8(0x80), jnp.int8)

    x_body = _rebias(body_ref[:])
    # The halo tiles are zeroed with a bitwise AND against a scalar
    # 0x00/0xFF splat — the only formulation this Mosaic toolchain
    # lowers for packed u8 blocks (iota-masked selects hit
    # "Not implemented: Sublane broadcast"; u8 vector×scalar multiply
    # fails to legalize arith.muli).  The wrapper guarantees N is a
    # multiple of C·128, so gating is all-or-nothing per program:
    # the head tile is garbage only at t == 0 (clamped index = left
    # zero-pad), the tail tile only at t == last (right zero-pad).
    # 0x00/0xFF built with subtract+truncate: a scalar u8 select fails
    # to legalize (arith.select), but i32 scalar arithmetic + trunc does.
    head_gate = (jnp.int32(0) - (t > 0).astype(jnp.int32)).astype(jnp.uint8)
    x_head = _rebias(head_ref[:] & head_gate)
    tail_gate = (jnp.int32(0) - (t < last_t).astype(jnp.int32)).astype(jnp.uint8)
    x_tail = _rebias(tail_ref[:] & tail_gate)

    for tl in range(col_tiles):
        acc = jnp.full((block_rows, LANE), bias, jnp.int32)
        # Side operands: the last `left` columns of the previous lane
        # tile and the first `center` columns of the next one.  Interior
        # tiles slice them from the (register-resident) body; boundary
        # tiles take them from the separately-DMA'd halo tiles.
        cur = x_body[:, tl * LANE : (tl + 1) * LANE]
        if left:
            prev = (x_head[:, LANE - left :] if tl == 0 else
                    x_body[:, tl * LANE - left : tl * LANE])
        if center:
            nxt = (x_tail[:, :center] if tl == col_tiles - 1 else
                   x_body[:, (tl + 1) * LANE : (tl + 1) * LANE + center])
        for plane, b in enumerate(exponents):
            prod = jnp.dot(cur, a_cur_ref[plane],
                           preferred_element_type=jnp.int32)
            if left:
                prod = prod + jnp.dot(prev, a_prev_ref[plane],
                                      preferred_element_type=jnp.int32)
            if center:
                prod = prod + jnp.dot(nxt, a_next_ref[plane],
                                      preferred_element_type=jnp.int32)
            acc = acc + (prod << b if b else prod)

        if needs_wrap:
            # Exact-wraparound path: reduce mod 2^acc_bits + sign-extend,
            # then the overflow-free bias-round-shift decomposition.
            if acc_bits < 32:
                shift = 32 - acc_bits
                acc = (acc << shift) >> shift
            low = acc & ((1 << frac_bits) - 1)
            carry = (low + (1 << (frac_bits - 1))) >> frac_bits
            final = (acc >> frac_bits) + carry
        else:
            # Provably-no-wrap fast path (host checked 255·Σ|h_fixed| +
            # bias headroom < 2^(acc_bits-1)): the rounding bias 2^(fb-1)
            # is folded into the SMEM bias constant, so the epilogue is
            # one arithmetic shift + clip.
            final = acc >> frac_bits

        o_ref[:, tl * LANE : (tl + 1) * LANE] = (
            jnp.clip(final, 0, 255).astype(jnp.uint8)
        )


@functools.partial(
    jax.jit,
    static_argnames=("exponents", "frac_bits", "acc_bits", "block_rows",
                     "col_tiles", "needs_wrap", "left", "center",
                     "interpret"),
)
def _fir_mxu_nopad(
    x,       # (B, N) uint8 — the raw input, no padding pass
    a_prev,  # (D_kept, max(left,1), 128) int8 side band planes
    a_cur,   # (D_kept, 128, 128) int8 current-tile band planes
    a_next,  # (D_kept, max(center,1), 128) int8 side band planes
    bias,    # (1, 1) int32
    exponents: tuple,
    frac_bits: int,
    acc_bits: int,
    block_rows: int,
    col_tiles: int,
    needs_wrap: bool,
    left: int,
    center: int,
    interpret: bool,
):
    batch, n = x.shape
    width = col_tiles * LANE
    grid = (-(-batch // block_rows), -(-n // width))
    num_lane_blocks = -(-n // LANE)
    depth = len(exponents)

    in_specs = [
        pl.BlockSpec((1, 1), lambda r, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(a_prev.shape, lambda r, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(a_cur.shape, lambda r, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(a_next.shape, lambda r, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        # Head: the lane tile immediately left of the body block
        # (clamped at t == 0 and masked in-kernel).
        pl.BlockSpec(
            (block_rows, LANE),
            lambda r, t: (r, jnp.maximum(t * col_tiles - 1, 0)),
            memory_space=pltpu.VMEM,
        ),
        # Body: the C output-aligned input tiles (one wide DMA).
        pl.BlockSpec((block_rows, width), lambda r, t: (r, t),
                     memory_space=pltpu.VMEM),
        # Tail: the lane tile immediately right of the body block
        # (clamped at the row end and masked in-kernel).
        pl.BlockSpec(
            (block_rows, LANE),
            lambda r, t: (r, jnp.minimum((t + 1) * col_tiles,
                                         num_lane_blocks - 1)),
            memory_space=pltpu.VMEM,
        ),
    ]

    kernel = functools.partial(
        _fir_mxu_kernel,
        exponents=exponents,
        col_tiles=col_tiles,
        frac_bits=frac_bits,
        acc_bits=acc_bits,
        needs_wrap=needs_wrap,
        left=left,
        center=center,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_rows, width), lambda r, t: (r, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, n), jnp.uint8),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(bias, a_prev, a_cur, a_next, x, x, x)


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def fir1d_fixed_rows_mxu(
    x_u8,
    h,
    qformat: QFormat = QFormat(),
    *,
    block_rows: int | None = None,
    col_tiles: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Bit-exact fixed-point FIR over (B, N) uint8 rows on the MXU.

    Same contract as ``fir1d_fixed_rows_jnp`` / ``fir1d_fixed_rows_pallas``
    (the golden contract of ``/root/reference`` ``fir_1d_fixed_ref.py:12``).

    Hot path (lane-aligned rows up to ``MAX_FULLROW_LANES`` tiles wide,
    ``col_tiles`` unset): full-row blocks updated **in place** via
    ``input_output_aliases`` — 320 Gsps on v5e, 2× the unaliased design
    (module docstring).  The caller's array is never mutated: XLA
    inserts one defensive copy at a jit boundary unless the buffer is
    donated; chained/jitted callers alias for free.

    Fallback (wider rows, or explicit ``col_tiles``): column-split
    output-aligned blocks with separately-DMA'd halo lane tiles (clamped
    BlockSpec indices, in-register edge gating, no padding pass).
    """
    if not qformat.tpu_native:
        raise ValueError(
            f"acc_bits={qformat.acc_bits} > 32 is not representable in the "
            "int32 TPU sim path; use models.golden.fir1d_fixed_golden_rows."
        )
    h_fixed = qformat.quantize_coeffs(h).astype(np.int64)
    a_prev, a_cur, a_next, exponents = build_tile_band_planes(h_fixed)
    num_taps = int(h_fixed.size)
    center = num_taps // 2
    left = num_taps - 1 - center
    # Wraparound emulation is only needed when the accumulator can
    # actually exceed the acc_bits range: worst |MAC| = 255·Σ|h_fixed|
    # (input bias included in the 128·Σh constant below, bounded by the
    # same sum). Otherwise the fast epilogue is bit-identical.
    worst_acc = 255 * int(np.abs(h_fixed).sum()) + (1 << (qformat.frac_bits - 1))
    needs_wrap = worst_acc >= (1 << (qformat.acc_bits - 1))
    # 128 · Σ h_fixed, reduced mod 2^32 into a two's-complement int32;
    # the fast path folds the rounding bias 2^(fb-1) in as well.
    bias_val = 128 * int(h_fixed.sum())
    if not needs_wrap:
        bias_val += 1 << (qformat.frac_bits - 1)
    bias_val &= 0xFFFFFFFF
    if bias_val >= 1 << 31:
        bias_val -= 1 << 32
    bias = np.asarray([[bias_val]], np.int32)

    x_u8 = jnp.asarray(x_u8, dtype=jnp.uint8)
    batch, n = x_u8.shape
    interpret = (
        (jax.default_backend() != "tpu") if interpret is None else interpret
    )
    lanes_needed = max(1, _round_up(n, LANE) // LANE)
    if col_tiles is None and lanes_needed <= MAX_FULLROW_LANES:
        # Full-row in-place hot path.
        n_pad = lanes_needed * LANE
        if block_rows is None:
            by_vmem = max(1, FULLROW_BLOCK_BYTES // n_pad)
            block_rows = int(min(_round_up(max(batch, 1), 8),
                                 _round_up(by_vmem, 8)))
        if n_pad != n:
            x_u8 = jnp.pad(x_u8, ((0, 0), (0, n_pad - n)))
        out = _fir_mxu_fullrow(
            x_u8,
            jnp.asarray(a_prev),
            jnp.asarray(a_cur),
            jnp.asarray(a_next),
            jnp.asarray(bias),
            exponents,
            qformat.frac_bits,
            qformat.acc_bits,
            block_rows,
            needs_wrap,
            left,
            center,
            interpret,
        )
        return out if n_pad == n else out[:, :n]

    if col_tiles is None:
        # Zero-copy requires N to be a multiple of C·128: pick the
        # largest C ≤ 32 that divides the (lane-rounded) width, so any
        # lane-aligned input runs without a padding pass.
        lanes = max(1, _round_up(n, LANE) // LANE)
        col_tiles = max(
            c for c in range(1, DEFAULT_COL_TILES + 1) if lanes % c == 0
        )
        if col_tiles < 4 and lanes > DEFAULT_COL_TILES:
            # Awkward widths (e.g. prime lane counts) would degrade to
            # C ∈ {1,2,3}: halo DMA becomes 2 tiles per C body tiles
            # (up to 3× HBM reads) *and* the per-program blocks shrink
            # to latency-bound sizes.  Pad N up to the nearest width
            # with a divisor ≥ 8 instead: the pad/crop copies cost about
            # the same bytes as the C=1 halo re-reads, but the kernel
            # then runs full-width blocks at streaming efficiency.
            lanes = min(
                (cand for cand in range(lanes + 1, lanes + DEFAULT_COL_TILES)
                 if any(cand % c == 0
                        for c in range(8, DEFAULT_COL_TILES + 1))),
                default=lanes,
            )
            col_tiles = max(
                c for c in range(1, DEFAULT_COL_TILES + 1)
                if lanes % c == 0
            )
    if block_rows is None:
        block_rows = int(min(DEFAULT_BLOCK_ROWS,
                             _round_up(max(batch, 1), 8)))
    n_pad = _round_up(max(n, 1), col_tiles * LANE)
    if n_pad != n:
        # Odd widths pay one zero-extend copy; the hot (lane-aligned)
        # path never does.
        x_u8 = jnp.pad(x_u8, ((0, 0), (0, n_pad - n)))
    out = _fir_mxu_nopad(
        x_u8,
        jnp.asarray(a_prev),
        jnp.asarray(a_cur),
        jnp.asarray(a_next),
        jnp.asarray(bias),
        exponents,
        qformat.frac_bits,
        qformat.acc_bits,
        block_rows,
        col_tiles,
        needs_wrap,
        left,
        center,
        interpret,
    )
    return out if n_pad == n else out[:, :n]


# ---------------------------------------------------------------------------
# Windowed-band kernel: bit-exact fixed FIR at MXU speed for ANY tap count
# up to MAX_TAPS_WINDOWED (generalizes the reference's scalar MAC loop,
# fir_1d_fixed_ref.py:95-107, beyond the tri-tile L ≤ 257 limit).
# ---------------------------------------------------------------------------


def build_window_band_planes(
    h_fixed: np.ndarray,
) -> tuple[np.ndarray, tuple[tuple[int, int, int, int], ...]]:
    """Stacked per-digit windowed band operands, row-trimmed per plane.

    The windowed formulation: output tile ``p`` is ONE matmul per digit
    plane against the contiguous input window starting ``left`` samples
    before the tile (``left = L - 1 - L//2``)::

        Y_p = X[:, p·128 - left : p·128 - left + K] @ A,
        A[j, i] = digit[i + L - 1 - j],   K = L + 127

    (derivation: output n = p·128+i reads input m = n - k + center, so
    k = i + (L-1) - j with j = m - (p·128 - left)).  Unlike the tri-tile
    split this is tile-count-independent, so it covers any L.

    Each digit plane is trimmed to its nonzero tap range
    ``[kmin_b, kmax_b]`` → rows ``j ∈ [L-1-kmax_b, L+127-kmin_b)``:
    long filters concentrate large taps near the center, so the
    high-byte plane's band is typically a small fraction of the low
    plane's, cutting MXU MACs well below the naive ``D·(L+127)``/sample.

    Returns ``(stacked, entries)`` — ``stacked`` is the row-concatenated
    ``(ΣK_b, 128)`` int8 operand; each entry is
    ``(exponent, j0, rows, offset)``: accumulation bit-shift, window-row
    origin of the trimmed block, its row count, and its row offset in
    ``stacked``.
    """
    h_fixed = np.asarray(h_fixed, dtype=np.int64)
    num_taps = h_fixed.size
    if num_taps > MAX_TAPS_WINDOWED:
        raise ValueError(
            f"windowed-band kernel supports up to {MAX_TAPS_WINDOWED} "
            f"taps, got {num_taps}."
        )
    reduced, pow2 = factor_pow2(h_fixed)
    digits = signed_base256_digits(reduced)  # (D, L)
    i_idx = np.arange(LANE)[None, :]
    blocks: list[np.ndarray] = []
    entries: list[tuple[int, int, int, int]] = []
    offset = 0
    for b in range(digits.shape[0]):
        digit = digits[b]
        nz = np.flatnonzero(digit)
        if nz.size == 0:
            continue
        kmin, kmax = int(nz[0]), int(nz[-1])
        j0 = num_taps - 1 - kmax
        rows = kmax - kmin + LANE
        j_idx = j0 + np.arange(rows)[:, None]
        k = i_idx + (num_taps - 1) - j_idx
        valid = (k >= 0) & (k < num_taps)
        a = np.zeros((rows, LANE), np.int8)
        a[valid] = digit[k[valid]]
        blocks.append(a)
        entries.append((8 * b + pow2, j0, rows, offset))
        offset += rows
    if not entries:  # all-zero filter
        blocks.append(np.zeros((1, LANE), np.int8))
        entries.append((0, 0, 1, 0))
    return np.concatenate(blocks, axis=0), tuple(entries)


def _window_bias_table(
    h_fixed: np.ndarray,
    entries: tuple[tuple[int, int, int, int], ...],
    bands: np.ndarray,
    n_pad: int,
    left: int,
    rounding_bias: int,
) -> np.ndarray:
    """Per-tile int32 bias rows folding rebias + zero-pad edge constants.

    Row ``tl`` holds ``128·Σh (+ 2^(fb-1) on the fast path)`` plus, for
    edge tiles whose window reaches past [0, n_pad), the exact
    contribution of the out-of-range positions: the golden contract
    zero-pads there, and a zero re-biases to x̃ = −128, so the missing
    dot rows contribute ``−128 · Σ_j A[j, :] << exp`` — a constant the
    host can fold.  Everything reduced mod 2^32 (exact per the golden
    wraparound contract).
    """
    col_tiles = n_pad // LANE
    base = 128 * int(np.asarray(h_fixed, np.int64).sum()) + rounding_bias
    table = np.full((col_tiles, LANE), base, dtype=np.int64)
    for tl in range(col_tiles):
        s0 = tl * LANE - left
        for exp, j0, rows, off in entries:
            sb = s0 + j0
            lo, hi = max(sb, 0), min(sb + rows, n_pad)
            if lo <= sb and hi >= sb + rows:
                continue  # fully in range: no pad contribution
            a = bands[off : off + rows].astype(np.int64)
            inside = np.zeros(rows, dtype=bool)
            inside[max(lo - sb, 0) : max(hi - sb, 0)] = True
            pad_sum = a[~inside].sum(axis=0)
            table[tl] += (-128 * pad_sum) << exp
    table &= 0xFFFFFFFF
    table[table >= 1 << 31] -= 1 << 32
    return table.astype(np.int32)


def _fir_mxu_window_kernel(
    bias_tbl_ref,  # (col_tiles, 128) int32: per-tile bias (+edge consts)
    bands_ref,     # (ΣK_b, 128) int8: stacked trimmed band planes
    body_ref,      # (BR, N) uint8: full rows (aliased with the output)
    o_ref,         # (BR, N) uint8 output
    *,
    entries: tuple[tuple[int, int, int, int], ...],
    frac_bits: int,
    acc_bits: int,
    needs_wrap: bool,
    left: int,
):
    block_rows, n = body_ref.shape
    col_tiles = n // LANE
    x_body = pltpu.bitcast(body_ref[:] ^ jnp.uint8(0x80), jnp.int8)

    for tl in range(col_tiles):
        acc = (jnp.zeros((block_rows, LANE), jnp.int32)
               + bias_tbl_ref[tl][None, :])
        s0 = tl * LANE - left
        for exp, j0, rows, off in entries:
            sb = s0 + j0
            lo, hi = max(sb, 0), min(sb + rows, n)
            if lo >= hi:
                continue  # window fully out of range: edge const covers it
            prod = jnp.dot(
                x_body[:, lo:hi],
                bands_ref[off + (lo - sb) : off + (hi - sb)],
                preferred_element_type=jnp.int32,
            )
            acc = acc + (prod << exp if exp else prod)

        if needs_wrap:
            if acc_bits < 32:
                shift = 32 - acc_bits
                acc = (acc << shift) >> shift
            low = acc & ((1 << frac_bits) - 1)
            carry = (low + (1 << (frac_bits - 1))) >> frac_bits
            final = (acc >> frac_bits) + carry
        else:
            final = acc >> frac_bits

        o_ref[:, tl * LANE : (tl + 1) * LANE] = (
            jnp.clip(final, 0, 255).astype(jnp.uint8)
        )


@functools.partial(
    jax.jit,
    static_argnames=("entries", "frac_bits", "acc_bits", "block_rows",
                     "needs_wrap", "left", "interpret"),
)
def _fir_mxu_window(
    x,         # (B, N) uint8, N a multiple of 128
    bands,     # (ΣK_b, 128) int8 stacked band planes
    bias_tbl,  # (N/128, 128) int32 per-tile bias table
    entries: tuple,
    frac_bits: int,
    acc_bits: int,
    block_rows: int,
    needs_wrap: bool,
    left: int,
    interpret: bool,
):
    batch, n = x.shape
    grid = (-(-batch // block_rows),)
    row_spec = pl.BlockSpec((block_rows, n), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(bias_tbl.shape, lambda r: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(bands.shape, lambda r: (0, 0),
                     memory_space=pltpu.VMEM),
        row_spec,
    ]
    kernel = functools.partial(
        _fir_mxu_window_kernel,
        entries=entries,
        frac_bits=frac_bits,
        acc_bits=acc_bits,
        needs_wrap=needs_wrap,
        left=left,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((batch, n), jnp.uint8),
        # Race-free in-place update, same argument as the fullrow kernel.
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(bias_tbl, bands, x)


def fir1d_fixed_rows_mxu_window(
    x_u8,
    h,
    qformat: QFormat = QFormat(),
    *,
    block_rows: int | None = None,
    max_row_lanes: int = MAX_FULLROW_LANES,
    interpret: bool | None = None,
) -> jax.Array:
    """Bit-exact fixed FIR on the MXU for any L ≤ ``MAX_TAPS_WINDOWED``.

    Same golden contract as :func:`fir1d_fixed_rows_mxu`
    (``/root/reference`` ``fir_1d_fixed_ref.py:12``), via the windowed
    band formulation (:func:`build_window_band_planes`): one int8 matmul
    per (lane tile × digit plane) against a contiguous ``L+127``-sample
    window, zero-pad edges folded into a host-built per-tile bias table.

    Rows wider than ``max_row_lanes`` lane tiles are overlap-save
    segmented at the jnp level (exact — segment margins carry the true
    neighboring samples) into full-row blocks; the two extra elementwise
    passes this costs keep long streams row-rich instead of falling to
    the ~5 Gsps VPU path.
    """
    if not qformat.tpu_native:
        raise ValueError(
            f"acc_bits={qformat.acc_bits} > 32 is not representable in the "
            "int32 TPU sim path; use models.golden.fir1d_fixed_golden_rows."
        )
    h_fixed = qformat.quantize_coeffs(h).astype(np.int64)
    num_taps = int(h_fixed.size)
    center = num_taps // 2
    left = num_taps - 1 - center
    x_u8 = jnp.asarray(x_u8, dtype=jnp.uint8)
    batch, n = x_u8.shape
    interpret = (
        (jax.default_backend() != "tpu") if interpret is None else interpret
    )

    lanes_needed = max(1, _round_up(n, LANE) // LANE)
    if lanes_needed > max_row_lanes:
        return _fir_window_segmented(
            x_u8, h, qformat, block_rows=block_rows,
            max_row_lanes=max_row_lanes, interpret=interpret,
        )

    bands, entries = build_window_band_planes(h_fixed)
    worst_acc = (255 * int(np.abs(h_fixed).sum())
                 + (1 << (qformat.frac_bits - 1)))
    needs_wrap = worst_acc >= (1 << (qformat.acc_bits - 1))
    rounding_bias = 0 if needs_wrap else (1 << (qformat.frac_bits - 1))

    n_pad = lanes_needed * LANE
    if n_pad != n:
        x_u8 = jnp.pad(x_u8, ((0, 0), (0, n_pad - n)))
    bias_tbl = _window_bias_table(
        h_fixed, entries, bands, n_pad, left, rounding_bias)
    if block_rows is None:
        by_vmem = max(1, FULLROW_BLOCK_BYTES // n_pad)
        block_rows = int(min(_round_up(max(batch, 1), 8),
                             _round_up(by_vmem, 8)))
    out = _fir_mxu_window(
        x_u8,
        jnp.asarray(bands),
        jnp.asarray(bias_tbl),
        entries,
        qformat.frac_bits,
        qformat.acc_bits,
        block_rows,
        needs_wrap,
        left,
        interpret,
    )
    return out if n_pad == n else out[:, :n]


def _fir_window_segmented(
    x_u8,
    h,
    qformat: QFormat,
    *,
    block_rows: int | None,
    max_row_lanes: int,
    interpret: bool,
) -> jax.Array:
    """Overlap-save segmentation of over-wide rows into full-row blocks.

    Each segment window carries ``left`` true samples of left margin and
    ``center`` of right margin (zeros at stream edges — exactly the
    golden zero-pad), so the kernel's same-mode output over the window's
    core equals the unsegmented output bit-for-bit; the core slices are
    then re-assembled.  This is the jnp-level analogue of the streaming
    delay line (``/root/reference`` ``fir_1d_ref.cpp:21-26``).
    """
    h_fixed = qformat.quantize_coeffs(h).astype(np.int64)
    num_taps = int(h_fixed.size)
    center = num_taps // 2
    left = num_taps - 1 - center
    batch, n = x_u8.shape

    window = max_row_lanes * LANE
    seg = window - _round_up(num_taps - 1, LANE)  # core samples/segment
    if seg <= 0:
        raise ValueError(
            f"num_taps={num_taps} too large for max_row_lanes="
            f"{max_row_lanes} segmentation windows."
        )
    n_seg = -(-n // seg)
    # Pad so every window slice is in-bounds: left margin up front, then
    # right margin + core rounding at the back.
    total = left + n_seg * seg + (window - seg - left)
    xp = jnp.pad(x_u8, ((0, 0), (left, total - left - n)))
    windows = jnp.concatenate(
        [xp[:, i * seg : i * seg + window] for i in range(n_seg)], axis=0
    )
    out = fir1d_fixed_rows_mxu_window(
        windows, h, qformat, block_rows=block_rows,
        max_row_lanes=max_row_lanes, interpret=interpret,
    )
    core = out[:, left : left + seg]
    stitched = jnp.concatenate(
        [core[i * batch : (i + 1) * batch] for i in range(n_seg)], axis=1
    )
    return stitched[:, :n]
