"""Pallas TPU kernel: bit-exact Q-format fixed-point 1-D FIR over rows.

The hot loop of the whole framework — the TPU-native replacement for the
reference's interpreted per-sample MAC loop
(``fir_1d_fixed_ref.py:95-128``) and its C++ streaming model
(``fir_1d/model/cpp/fir_1d_ref.cpp:16-33``).

Design (see /opt/skills/guides/pallas_guide.md):

- **Memory-bound formulation**: a small-tap FIR moves ~2 bytes/sample
  (uint8 in, uint8 out); the kernel reads uint8 straight from VMEM,
  widens to int32 *in registers*, MACs with L static shifted slices
  (VPU), and writes uint8 back — no intermediate int32 array ever
  touches HBM, unlike the jnp path where XLA materializes the widened
  pad.
- **Bit-exactness**: identical int32 modular-arithmetic formulation as
  ``ops/fir1d.py`` (wraparound = shift pair; bias-round-shift =
  ``(acc >> fb) + carry``).  Verified bit-for-bit against the numpy
  golden in tests (interpret mode) and on hardware (bench).
- **Grid**: 1-D over row blocks; each program sees a
  ``(BLOCK_ROWS, padded_width + L - 1)`` haloed input block and writes a
  ``(BLOCK_ROWS, padded_width)`` output block.  Column padding to a lane
  multiple (128) keeps tiles aligned; row padding to the block size keeps
  the grid exact.  Same-mode halo asymmetry (left ``L-1-center``, right
  ``center``) is applied by the host wrapper via ``jnp.pad``.

Coefficients ride in SMEM as an ``(1, L)`` int32 scalar block — one
scalar read per tap per block, negligible against the VPU MACs.
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
#: Scoped VMEM budget per program: leave headroom under the ~16 MB/core
#: scoped limit for Mosaic temporaries (the widened int32 copy + acc).
VMEM_BUDGET_BYTES = 12 * 1024 * 1024
#: Empirical per-sample VMEM footprint: u8 in ×2 (double buffer) + widened
#: int32 + int32 acc + u8 out ×2 + slack ≈ 18 bytes/sample.
_BYTES_PER_SAMPLE = 18


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _auto_block_rows(width: int) -> int:
    rows = VMEM_BUDGET_BYTES // (_BYTES_PER_SAMPLE * max(width, LANE))
    rows = (rows // 8) * 8
    return int(max(8, min(512, rows)))


def _fir_fixed_kernel(
    h_ref,  # (1, L) int32 in SMEM
    x_ref,  # (BR, W_in) uint8 in VMEM (pre-haloed)
    o_ref,  # (BR, W_out) uint8 in VMEM
    *,
    num_taps: int,
    frac_bits: int,
    acc_bits: int,
    out_width: int,
):
    x32 = x_ref[:].astype(jnp.int32)  # widen once; slices below are views
    acc = jnp.zeros(o_ref.shape, jnp.int32)
    for k in range(num_taps):
        # y[n] = Σ_k h[k] * xp[n + (L-1) - k]  (same-mode, zero-padded).
        start = num_taps - 1 - k
        window = x32[:, start : start + out_width]
        acc = acc + h_ref[0, k] * window  # int32 MAC, wraps mod 2^32

    if acc_bits < 32:
        # Truncate + sign-extend to acc_bits (fir_1d_fixed_ref.py:94,110-115).
        shift = 32 - acc_bits
        acc = (acc << shift) >> shift

    # Bias round + rescale without overflow (fir_1d_fixed_ref.py:118-120).
    low = acc & ((1 << frac_bits) - 1)
    carry = (low + (1 << (frac_bits - 1))) >> frac_bits
    final = (acc >> frac_bits) + carry

    o_ref[:] = jnp.clip(final, 0, 255).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("num_taps", "frac_bits", "acc_bits", "block_rows",
                     "interpret"),
)
def _fir_fixed_pallas_padded(
    x_pad: jnp.ndarray,  # (B_pad, W_out_pad + L - 1) uint8, pre-haloed
    h_i32: jnp.ndarray,  # (1, L) int32
    num_taps: int,
    frac_bits: int,
    acc_bits: int,
    block_rows: int,
    interpret: bool,
):
    b_pad, w_in = x_pad.shape
    w_out = w_in - (num_taps - 1)
    kernel = functools.partial(
        _fir_fixed_kernel,
        num_taps=num_taps,
        frac_bits=frac_bits,
        acc_bits=acc_bits,
        out_width=w_out,
    )
    grid = (b_pad // block_rows,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, num_taps), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, w_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, w_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, w_out), jnp.uint8),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(h_i32, x_pad)


def _use_interpret() -> bool:
    """Pallas compiles only on TPU; interpret elsewhere (tests on CPU)."""
    return jax.default_backend() != "tpu"


def fir1d_fixed_rows_pallas(
    x_u8,
    h,
    qformat: QFormat = QFormat(),
    *,
    block_rows: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Bit-exact fixed-point FIR over (B, N) uint8 rows via Pallas.

    Drop-in equivalent of :func:`ops.fir1d.fir1d_fixed_rows_jnp` (same
    contract, same bit-exactness guarantee), hand-scheduled for TPU.
    """
    if not qformat.tpu_native:
        raise ValueError(
            f"acc_bits={qformat.acc_bits} > 32 is not representable in the "
            "int32 TPU sim path; use models.golden.fir1d_fixed_golden_rows."
        )
    h_fixed = qformat.quantize_coeffs(h).astype(np.int32)
    num_taps = int(h_fixed.size)
    center = num_taps // 2

    x_u8 = jnp.asarray(x_u8, dtype=jnp.uint8)
    batch, n = x_u8.shape
    n_pad = _round_up(max(n, 1), LANE)
    if block_rows is None:
        block_rows = _auto_block_rows(n_pad)
    b_pad = _round_up(max(batch, 1), block_rows)
    # Left halo (L-1-center) + right halo (center) + alignment padding.
    x_padded = jnp.pad(
        x_u8,
        (
            (0, b_pad - batch),
            (num_taps - 1 - center, center + (n_pad - n)),
        ),
    )
    out = _fir_fixed_pallas_padded(
        x_padded,
        jnp.asarray(h_fixed).reshape(1, num_taps),
        num_taps,
        qformat.frac_bits,
        qformat.acc_bits,
        block_rows,
        _use_interpret() if interpret is None else interpret,
    )
    return out[:batch, :n]
