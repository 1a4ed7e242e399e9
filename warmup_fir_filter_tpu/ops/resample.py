"""Polyphase rational resampling (the north-star's resample stage).

Rational rate change by P/Q (upsample P, anti-alias low-pass, downsample
Q) computed in true polyphase form — the zero-stuffed upsampled stream is
never materialized.  Derivation from the same-mode contract:

With ``xu[i] = x[i/P]`` when ``P | i`` else 0, and ``z = FIR(xu, h)``
(same-mode, center ``c = L // 2``), the retained outputs are
``y[m] = z[m·Q]``.  Substituting::

    y[m] = Σ_j h[r_m + P·j] · x[b_m − j]
    r_m  = (m·Q + c) mod P            (polyphase branch)
    b_m  = (m·Q + c − r_m) / P        (input anchor)

Output length is ``ceil(N·P / Q)`` (every m with ``m·Q < N·P``).

Both numeric paths share this skeleton:

- float model path (float64 host oracle / float32 jnp);
- bit-exact fixed sim path: quantized taps, int32 MAC, accumulator
  wraparound, bias-round-shift, saturate — the 1-D golden contract
  applied to each polyphase branch (one epilogue per output sample).
"""

from __future__ import annotations

from functools import partial
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np

from warmup_fir_filter_tpu.ops.fir1d import fixed_epilogue_i32
from warmup_fir_filter_tpu.ops.qformat import (
    QFormat,
    bias_round_shift_np,
    saturate_pixel_np,
    wrap_to_acc_bits_np,
)


def design_lowpass(num_taps: int, cutoff: float, *, gain: float = 1.0) -> np.ndarray:
    """Windowed-sinc low-pass (Hamming), normalized to ``gain`` at DC.

    ``cutoff`` is the normalized frequency in (0, 1) relative to Nyquist.
    Standard textbook design (parity with scipy.signal.firwin semantics).
    """
    if not 0.0 < cutoff < 1.0:
        raise ValueError(f"cutoff={cutoff} must be in (0, 1)")
    n = np.arange(num_taps, dtype=np.float64) - (num_taps - 1) / 2.0
    h = np.sinc(cutoff * n) * cutoff
    window = 0.54 - 0.46 * np.cos(
        2.0 * np.pi * np.arange(num_taps) / (num_taps - 1)
    )
    h *= window
    return h * (gain / h.sum())


def _plan(n: int, up: int, down: int, num_taps: int):
    """Per-output (branch, anchor) index plan, host-side numpy."""
    if up < 1 or down < 1:
        raise ValueError(f"up={up} and down={down} must be >= 1")
    if gcd(up, down) != 1:
        raise ValueError(f"up={up} and down={down} must be coprime")
    center = num_taps // 2
    m = np.arange(-(-n * up // down))  # ceil(N·P / Q) outputs
    u = m * down + center
    branch = u % up
    anchor = (u - branch) // up
    return m.size, branch, anchor, center


def _polyphase_taps(h: np.ndarray, up: int) -> np.ndarray:
    """(P, J) branch taps: ``taps[r, j] = h[r + P·j]`` (zero-padded)."""
    num_taps = h.shape[0]
    branches = -(-num_taps // up)
    padded = np.zeros(up * branches, h.dtype)
    padded[:num_taps] = h
    return padded.reshape(branches, up).T.copy()


def resample_poly_golden(
    x, h, up: int, down: int
) -> np.ndarray:
    """Float64 host oracle over (C, T) rows."""
    x64 = np.asarray(x, np.float64)
    h64 = np.asarray(h, np.float64)
    channels, n = x64.shape
    out_len, branch, anchor, _ = _plan(n, up, down, h64.size)
    taps = _polyphase_taps(h64, up)  # (P, J)
    num_branches = taps.shape[1]
    y = np.zeros((channels, out_len), np.float64)
    # Same float64 accumulation order as the golden FIR: ascending j.
    xp = np.pad(x64, ((0, 0), (num_branches, num_branches)))
    for j in range(num_branches):
        idx = anchor - j + num_branches  # in-bounds via padding
        idx = np.clip(idx, 0, xp.shape[1] - 1)
        valid = ((anchor - j) >= 0) & ((anchor - j) < n)
        y += np.where(valid, taps[branch, j] * xp[:, idx], 0.0)
    return y


def resample_poly_fixed_golden(
    x_u8, h, up: int, down: int, qformat: QFormat = QFormat()
) -> np.ndarray:
    """Bit-accurate fixed-point resampler (trusted host oracle)."""
    x64 = np.asarray(x_u8, np.int64)
    h_fixed = qformat.quantize_coeffs(np.asarray(h)).astype(np.int64)
    channels, n = x64.shape
    out_len, branch, anchor, _ = _plan(n, up, down, h_fixed.size)
    taps = _polyphase_taps(h_fixed, up)
    num_branches = taps.shape[1]
    acc = np.zeros((channels, out_len), np.int64)
    xp = np.pad(x64, ((0, 0), (num_branches, num_branches)))
    for j in range(num_branches):
        idx = anchor - j + num_branches
        idx = np.clip(idx, 0, xp.shape[1] - 1)
        valid = ((anchor - j) >= 0) & ((anchor - j) < n)
        acc += np.where(valid, taps[branch, j] * xp[:, idx], 0)
    acc = wrap_to_acc_bits_np(acc, qformat.acc_bits)
    return saturate_pixel_np(bias_round_shift_np(acc, qformat.frac_bits))


@partial(jax.jit, static_argnames=("num_branches", "out_len"))
def _poly_float_core(x_f32, taps_f32, branch, anchor, num_branches, out_len):
    channels = x_f32.shape[0]
    n = x_f32.shape[1]
    xp = jnp.pad(x_f32, ((0, 0), (num_branches, num_branches)))
    acc = jnp.zeros((channels, out_len), jnp.float32)
    for j in range(num_branches):
        src = anchor - j
        idx = jnp.clip(src + num_branches, 0, xp.shape[1] - 1)
        valid = (src >= 0) & (src < n)
        acc = acc + jnp.where(valid, taps_f32[branch, j] * xp[:, idx], 0.0)
    return acc


def resample_poly(x, h, up: int, down: int) -> jax.Array:
    """Float32 polyphase resampler on device over (C, T) rows."""
    h64 = np.asarray(h, np.float64)
    x_f32 = jnp.asarray(x, jnp.float32)
    n = int(x_f32.shape[1])
    out_len, branch, anchor, _ = _plan(n, up, down, h64.size)
    taps = _polyphase_taps(h64, up)
    return _poly_float_core(
        x_f32,
        jnp.asarray(taps, jnp.float32),
        jnp.asarray(branch),
        jnp.asarray(anchor),
        int(taps.shape[1]),
        out_len,
    )


@partial(jax.jit, static_argnames=("num_branches", "out_len", "frac_bits",
                                   "acc_bits"))
def _poly_fixed_core(x_i32, taps_i32, branch, anchor, num_branches, out_len,
                     frac_bits, acc_bits):
    channels = x_i32.shape[0]
    n = x_i32.shape[1]
    xp = jnp.pad(x_i32, ((0, 0), (num_branches, num_branches)))
    acc = jnp.zeros((channels, out_len), jnp.int32)
    for j in range(num_branches):
        src = anchor - j
        idx = jnp.clip(src + num_branches, 0, xp.shape[1] - 1)
        valid = (src >= 0) & (src < n)
        acc = acc + jnp.where(valid, taps_i32[branch, j] * xp[:, idx], 0)
    return fixed_epilogue_i32(acc, frac_bits, acc_bits)


def resample_poly_fixed(
    x_u8, h, up: int, down: int, qformat: QFormat = QFormat()
) -> jax.Array:
    """Bit-exact fixed-point polyphase resampler on device."""
    if not qformat.tpu_native:
        raise ValueError(
            f"acc_bits={qformat.acc_bits} > 32 is not representable in the "
            "int32 TPU sim path; use resample_poly_fixed_golden."
        )
    h_fixed = qformat.quantize_coeffs(np.asarray(h)).astype(np.int32)
    x_i32 = jnp.asarray(x_u8, jnp.int32)
    n = int(x_i32.shape[1])
    out_len, branch, anchor, _ = _plan(n, up, down, h_fixed.size)
    taps = _polyphase_taps(h_fixed, up)
    return _poly_fixed_core(
        x_i32,
        jnp.asarray(taps),
        jnp.asarray(branch),
        jnp.asarray(anchor),
        int(taps.shape[1]),
        out_len,
        qformat.frac_bits,
        qformat.acc_bits,
    )
