"""Pallas window-copy kernel: overlapping sub-row windows in-kernel.

The r5 rounds hit the same wall three times: XLA lowers hop-window
framing (``frame_overlap``-style reshape/concat) at ~23 GB/s on TPU,
which sank the framed FFT path (2.5 Gsps), the row-split streaming
geometry (4.7 vs 11.7 Gsps), and a packed-generator experiment
(docs/roofline.md).  The FFT fix built its windows inside the compute
kernel; this module is the REUSABLE form of that trick for row-wise
consumers: a copy kernel that reads aligned lane-tile slabs (plus one
halo tile per side and a caller-supplied left-edge tile for stream
carry) and emits overlapping windows as rows, at Pallas streaming rate
instead of the XLA relayout rate.

Output layout is WINDOW-major (row ``r·C + c`` = window ``r`` of
channel ``c``): building rows this way concatenates (C, 128) tile
slabs — full-sublane VPU copies — where a channel-major layout would
need a sublane scatter.  Row-wise consumers (the band FIR) don't care
about row order, and checksum/reduction consumers can re-index with a
fused iota instead of ever transposing (``ops/streaming.py``,
``_emit_windowed_checksums``).

Measured (16ch × 4M u8 blocks, 5-tap scan pipeline, v5e): the
windowed pipeline runs the band FIR at 4000 rows instead of 16 and
sustains 2.1× the unsplit scan (`scratch/probe_window_kernel.py`;
artifact in BENCH_STREAMING_r05).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def window_rows_supported(channels: int, total: int, sub: int,
                          num_taps: int) -> bool:
    """Geometry gate: lane-aligned sub-rows, one-tile halos cover L."""
    return (sub % LANE == 0 and sub > 0 and total % sub == 0
            and 1 <= num_taps <= LANE + 1 and channels >= 1)


def _window_kernel(carry_ref, x_ref, hl_ref, hr_ref, o_ref, *,
                   g_windows, spt, channels, total):
    """Program j: windows ``j·G .. j·G+G`` of ALL channels (r-major).

    Window tile ``t`` of window ``g`` reads the virtual stream
    ``left_edge || x || zeros`` at global tile ``j·G·spt + g·spt − 1 +
    t``; tile −1 comes from the left-halo operand (or the caller's
    ``carry`` tile on the very first window), tiles ≥ total/128 are
    zero-masked (the stream's right zero-pad).
    """
    j = pl.program_id(0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (channels, LANE), 1)
    w_tiles = spt + 2
    rows = []
    for g in range(g_windows):
        parts = []
        for t in range(w_tiles):
            rel = g * spt - 1 + t
            if rel < 0:
                src = hl_ref[:]
            elif rel < g_windows * spt:
                src = x_ref[:, rel * LANE:(rel + 1) * LANE]
            else:
                src = hr_ref[:]
            gt = j * (g_windows * spt) + rel
            cols = col_iota + gt * LANE
            if rel < 0:
                src = jnp.where(j == 0, carry_ref[:], src)
            src = jnp.where((cols >= -LANE) & (cols < total), src,
                            jnp.uint8(0))
            parts.append(src)
        rows.append(jnp.concatenate(parts, axis=1))
    o_ref[:] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=(
    "sub", "g_windows", "interpret"))
def window_rows_pallas(x_u8, carry_ext_u8, sub, g_windows,
                       interpret=False):
    """(C, T) u8 → (R·C, sub + 256) u8 overlapping windows, R = T/sub.

    Window ``(r, c)`` (output row ``r·C + c``) holds the virtual
    stream ``carry_ext || x || zeros`` over columns
    ``[r·sub − 128, r·sub + sub + 128)`` — one aligned halo lane-tile
    per side, enough for same-mode FIRs with L ≤ 129.
    ``carry_ext_u8`` is (C, 128): the stream content preceding
    ``x[:, 0]`` (its last L−1 columns are the delay line; the rest
    zeros).  All reads/writes are lane-tile aligned; stream edges are
    masked per lane.
    """
    channels, total = x_u8.shape
    assert sub % LANE == 0 and total % sub == 0
    r = total // sub
    assert r % g_windows == 0
    spt = sub // LANE
    w = (spt + 2) * LANE
    grid = (r // g_windows,)
    main_spec = pl.BlockSpec((channels, g_windows * sub),
                             lambda j: (0, j), memory_space=pltpu.VMEM)
    hl_spec = pl.BlockSpec(
        (channels, LANE),
        lambda j: (0, jnp.maximum(j * g_windows * spt - 1, 0)),
        memory_space=pltpu.VMEM)
    hr_spec = pl.BlockSpec(
        (channels, LANE),
        lambda j: (0, jnp.minimum((j + 1) * g_windows * spt,
                                  total // LANE - 1)),
        memory_space=pltpu.VMEM)
    carry_spec = pl.BlockSpec((channels, LANE), lambda j: (0, 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(
        _window_kernel, g_windows=g_windows, spt=spt,
        channels=channels, total=total)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[carry_spec, main_spec, hl_spec, hr_spec],
        out_specs=pl.BlockSpec((g_windows * channels, w),
                               lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r * channels, w), jnp.uint8),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(carry_ext_u8, x_u8, x_u8, x_u8)
