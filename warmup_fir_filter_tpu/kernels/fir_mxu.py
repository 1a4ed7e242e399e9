"""MXU Pallas kernel: fixed-point FIR as banded int8 systolic matmuls.

The speed-of-light formulation (SURVEY.md §7.3 item 2).  The VPU
shifted-MAC kernel (``fir_pallas.py``) is *compute*-bound (~L·4 VPU ops
per sample); this kernel moves the MACs onto the 128×128 int8 MXU so the
FIR becomes *memory*-bound — the true roofline for a 2-bytes-per-sample
op.

Formulation
-----------
Split each output row into 128-sample tiles.  With the input pre-haloed
(left ``L-1-center`` zeros, SURVEY.md §3.2 alignment), output tile ``p``
reads only input tiles ``p`` and ``p+1`` (requires ``L ≤ 129``):

    Y_p = X_p @ A0  +  X_{p+1} @ A1

where ``A0[j, i] = h_fixed[i + L - 1 - j]`` (a banded 128×128 transfer
matrix) and ``A1`` holds the band's wrap into the next tile.

Exactness on the int8 MXU is obtained by two exact encodings:

- **Coefficients**: signed base-256 digit decomposition
  ``h = Σ_b 256^b · s_b`` with each digit ``s_b ∈ [-128, 127]`` (int8).
  Every digit yields a pair of band matrices; the kernel accumulates
  ``Σ_b 256^b · (X @ A0_b + X' @ A1_b)`` in int32, which wraps mod 2^32
  exactly like the golden contract.
- **Samples**: uint8 pixels are re-biased to ``x̃ = x - 128 ∈ int8``
  *inside* the kernel (no extra HBM traffic); the constant correction
  ``128 · Σ_k h_fixed[k]`` is added back into the accumulator.  Zero
  padding stays exact because a padded 0 becomes ``x̃ = -128`` whose
  +128 bias restores the zero contribution.

Each 128-lane output tile costs ``2·D`` int8 matmuls (D = digit count,
2 for Q4.12 filter banks) = 512 MACs/sample — far below the v5e MXU's
~394 TOPS, leaving HBM bandwidth as the only wall.
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
DEFAULT_COL_TILES = 32  # output tiles per program; input traffic ×(C+1)/C
MAX_TAPS = LANE + 1


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


def build_band_matrices(h_fixed: np.ndarray) -> tuple[np.ndarray, tuple[int, ...]]:
    """Stacked digit-split banded transfer matrices.

    Returns ``(stacked, exponents)`` where ``stacked`` is
    ``(D_kept, 256, 128)`` int8 — for each *non-zero* digit plane ``b``,
    rows 0..127 hold ``A0_b[j, i] = digit_b[i + L - 1 - j]`` (current
    input tile) and rows 128..255 hold ``A1_b`` (the band's spill into
    the next tile) — so each output tile is a single K=256 matmul
    ``[X_t | X_{t+1}] @ stacked[b]`` per digit.  ``exponents`` are the
    byte positions of the kept planes (all-zero planes — common for
    Q4.12 banks whose coefficients are multiples of 256 — cost nothing).
    """
    h_fixed = np.asarray(h_fixed, dtype=np.int64)
    num_taps = h_fixed.size
    if num_taps > MAX_TAPS:
        raise ValueError(
            f"MXU kernel supports up to {MAX_TAPS} taps, got {num_taps}."
        )
    digits = signed_base256_digits(h_fixed)  # (D, L)
    j_idx = np.arange(LANE)[:, None]  # input position within tile
    i_idx = np.arange(LANE)[None, :]  # output position within tile
    k0 = i_idx + (num_taps - 1) - j_idx
    k1 = k0 - LANE
    m0 = (k0 >= 0) & (k0 < num_taps)
    m1 = (k1 >= 0) & (k1 < num_taps)
    # A1[j, i] is nonzero only for j < L - 1 (the band's spill), so the
    # stacked operand needs only K = 128 + L - 1 rows — halving the MXU
    # work for small taps versus a full two-tile stack.
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
        exponents.append(b)
    if not planes:  # all-zero filter
        planes.append(np.zeros((LANE + spill, LANE), np.int8))
        exponents.append(0)
    return np.stack(planes), tuple(exponents)


def _fir_mxu_kernel(
    bias_ref,  # (1, 1) int32 in SMEM: 128 * Σ h_fixed (mod 2^32)
    a_ref,     # (D_kept, 256, 128) int8 in VMEM: stacked [A0; A1] planes
    body_ref,  # (BR, C·128) uint8: output-aligned input tiles
    tail_ref,  # (BR, 128) uint8: one extra tile to the right
    o_ref,     # (BR, C·128) uint8 output
    *,
    exponents: tuple[int, ...],
    col_tiles: int,
    frac_bits: int,
    acc_bits: int,
    needs_wrap: bool,
    spill: int,
):
    bias = bias_ref[0, 0]

    # Re-bias uint8 → int8: x - 128 ≡ x XOR 0x80 reinterpreted as int8
    # (two cheap VPU ops per byte, no widening).
    def _rebias(u8):
        return pltpu.bitcast(u8 ^ jnp.uint8(0x80), jnp.int8)

    x_body = _rebias(body_ref[:])   # (BR, C·128)
    x_tail = _rebias(tail_ref[:])   # (BR, 128)
    block_rows = x_body.shape[0]

    # Per-tile matmuls on lane-aligned *views* of the body block.  An
    # earlier formulation flattened (BR, C·128) → (BR·C, 128) for two big
    # matmuls per digit; that reshape (and the matching concat for the
    # shifted operand and the output reshape) each cost a full VMEM
    # relayout pass — measured ~13% of kernel time.  Lane-tile slices
    # cost nothing, and M = BR = 512 rows still fills the MXU pipeline.
    for t in range(col_tiles):
        xt = x_body[:, t * LANE : (t + 1) * LANE]
        # The band's spill reads the first `spill` samples of tile t+1
        # (the separate tail operand supplies it for the last tile).
        if t + 1 < col_tiles:
            corner = x_body[:, (t + 1) * LANE : (t + 1) * LANE + spill]
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

        o_ref[:, t * LANE : (t + 1) * LANE] = (
            jnp.clip(final, 0, 255).astype(jnp.uint8)
        )


@functools.partial(
    jax.jit,
    static_argnames=("exponents", "frac_bits", "acc_bits", "block_rows",
                     "col_tiles", "needs_wrap", "interpret"),
)
def _fir_mxu_padded(
    x_ext,   # (B_pad, W_out_pad + 128) uint8, pre-haloed + aligned
    a,       # (D_kept, 256, 128) int8 stacked [A0; A1] band planes
    bias,    # (1, 1) int32
    exponents: tuple,
    frac_bits: int,
    acc_bits: int,
    block_rows: int,
    col_tiles: int,
    needs_wrap: bool,
    interpret: bool,
):
    b_pad, w_in = x_ext.shape
    w_out = w_in - LANE
    depth = len(exponents)
    grid = (b_pad // block_rows, w_out // (col_tiles * LANE))

    in_specs = [
        pl.BlockSpec((1, 1), lambda r, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((depth, a.shape[1], LANE), lambda r, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        # Body: the C output-aligned input tiles (one wide DMA) ...
        pl.BlockSpec((block_rows, col_tiles * LANE), lambda r, t: (r, t),
                     memory_space=pltpu.VMEM),
        # ... plus the single next tile the band spills into.
        pl.BlockSpec((block_rows, LANE),
                     lambda r, t: (r, t * col_tiles + col_tiles),
                     memory_space=pltpu.VMEM),
    ]

    kernel = functools.partial(
        _fir_mxu_kernel,
        exponents=exponents,
        col_tiles=col_tiles,
        frac_bits=frac_bits,
        acc_bits=acc_bits,
        needs_wrap=needs_wrap,
        spill=a.shape[1] - LANE,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_rows, col_tiles * LANE),
            lambda r, t: (r, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, w_out), jnp.uint8),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(bias, a, x_ext, x_ext)


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

    Same contract as ``fir1d_fixed_rows_jnp`` / ``fir1d_fixed_rows_pallas``.
    Block geometry defaults adapt to the input so small inputs are not
    padded out to the full-throughput tile shape.
    """
    if not qformat.tpu_native:
        raise ValueError(
            f"acc_bits={qformat.acc_bits} > 32 is not representable in the "
            "int32 TPU sim path; use models.golden.fir1d_fixed_golden_rows."
        )
    h_fixed = qformat.quantize_coeffs(h).astype(np.int64)
    num_taps = int(h_fixed.size)
    center = num_taps // 2
    a_stacked, exponents = build_band_matrices(h_fixed)
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
    if col_tiles is None:
        # Don't pad narrow inputs out to the full-throughput tile count.
        col_tiles = int(min(DEFAULT_COL_TILES,
                            max(1, -(-n // LANE))))
    if block_rows is None:
        block_rows = int(min(DEFAULT_BLOCK_ROWS,
                             _round_up(max(batch, 1), 8)))
    b_pad = _round_up(max(batch, 1), block_rows)
    n_pad = _round_up(max(n, 1), col_tiles * LANE)
    # Extended width is exactly n_pad + one extra lane-tile so that output
    # tile p reads input tiles p and p+1; the left halo (L-1-center ≤ 128)
    # occupies the head, zeros fill the rest.
    left = num_taps - 1 - center
    x_ext = jnp.pad(
        x_u8,
        ((0, b_pad - batch), (left, n_pad + LANE - left - n)),
    )
    out = _fir_mxu_padded(
        x_ext,
        jnp.asarray(a_stacked),
        jnp.asarray(bias),
        exponents,
        qformat.frac_bits,
        qformat.acc_bits,
        block_rows,
        col_tiles,
        needs_wrap,
        (jax.default_backend() != "tpu") if interpret is None else interpret,
    )
    return out[:batch, :n]
