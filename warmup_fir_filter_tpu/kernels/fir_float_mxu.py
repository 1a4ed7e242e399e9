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
        # Wide rows: overlap-save segmentation — fold time into batch
        # rows with L-1 halo margins so every segment is an independent
        # row of the full-row kernel (central outputs see no zero-pad).
        center = num_taps // 2
        e = num_taps - 1 - center
        seg = (MAX_FULLROW_LANES // 2) * LANE
        num_seg = -(-n // seg)
        xp = jnp.pad(x_f32, ((0, 0), (e, num_seg * seg - n + center)))
        windows = jnp.concatenate(
            [
                jax.lax.slice(
                    xp, (0, s * seg), (batch, s * seg + seg + e + center)
                )
                for s in range(num_seg)
            ],
            axis=0,
        )  # (S·B, seg + L - 1), segment-major
        out_ext = fir1d_ideal_rows_mxu(
            windows, h, precision=precision, block_rows=block_rows,
            interpret=interpret,
        )
        core = out_ext[:, e : e + seg]
        # (S·B, seg) → (B, S·seg) → crop; segments are stacked along
        # axis 0 in s-major order.
        out = jnp.concatenate(
            [core[s * batch : (s + 1) * batch] for s in range(num_seg)],
            axis=1,
        )
        return out[:, :n]

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
