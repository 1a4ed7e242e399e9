"""Stateful block-streaming FIR with checkpointable carry state.

TPU-native successor of the reference's C++ streaming model
(``fir_1d/model/cpp/fir_1d_ref.cpp:16-33``: a Direct-Form-I delay line
shifted one sample at a time) and of its implicit checkpoint/resume
subsystem (SURVEY.md §5.4): here the delay line is a ``(C, L-1)`` carry
block processed a whole block at a time, and the carry *is* the resume
state — exactly the halo that the multi-chip path exchanges over ICI.

Semantics: feeding blocks x_0, x_1, … of width S emits blocks y_0, y_1,…
such that ``concat(y_b)`` equals the same-mode filtering of the
zero-prepended stream delayed by ``center = L // 2`` samples:

    emitted[t] = y_global[t - center]      (zero-pad before t = 0)

``flush()`` pushes ``center`` zeros to emit the final tail, after which
``concat(all emitted)[center:]`` is bit-identical to the offline
``fir1d_fixed_rows_jnp`` output of the whole stream.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from warmup_fir_filter_tpu.ops.fir1d import fixed_fir_prehaloed_i32
from warmup_fir_filter_tpu.ops.qformat import QFormat


@dataclasses.dataclass
class FirStreamState:
    """Checkpointable streaming state: the delay line + sample count."""

    carry: np.ndarray  # (C, L-1) int32 — last L-1 input samples
    samples_seen: int

    def save(self, path: Path) -> None:
        np.savez(path, carry=self.carry,
                 samples_seen=np.int64(self.samples_seen))

    @classmethod
    def load(cls, path: Path) -> "FirStreamState":
        data = np.load(path)
        return cls(
            carry=np.asarray(data["carry"], np.int32),
            samples_seen=int(data["samples_seen"]),
        )


class Fir1DStream:
    """Block-streaming bit-exact fixed-point FIR over C channels.

    Drop-in capability parity with the reference C++ ``Fir1D``
    (``set_taps``/``process``/``reset``, ``fir_1d_ref.h:8-27``) but
    block-oriented, jit-compiled, and with first-class state
    checkpointing.
    """

    def __init__(self, h, channels: int, qformat: QFormat = QFormat()):
        if not qformat.tpu_native:
            raise ValueError(
                f"acc_bits={qformat.acc_bits} > 32 is not representable in "
                "the int32 TPU sim path."
            )
        self.qformat = qformat
        self.channels = int(channels)
        self.set_taps(h)

    def set_taps(self, h) -> None:
        self._h_raw = np.asarray(h, np.float64)
        self._h_fixed = self.qformat.quantize_coeffs(h).astype(np.int32)
        self.num_taps = int(self._h_fixed.size)
        self.center = self.num_taps // 2
        self.reset()

    def reset(self) -> None:
        """Zero the delay line (``fir_1d_ref.cpp:35``)."""
        self.state = FirStreamState(
            carry=np.zeros((self.channels, self.num_taps - 1), np.int32),
            samples_seen=0,
        )

    def process(self, x_block) -> np.ndarray:
        """Feed a (C, S) uint8 block; returns the (C, S) uint8 output."""
        x = np.asarray(x_block)
        if x.shape[0] != self.channels:
            raise ValueError(
                f"Expected {self.channels} channels, got {x.shape[0]}."
            )
        y, new_carry = _stream_step(
            jnp.asarray(x, jnp.int32),
            jnp.asarray(self.state.carry),
            jnp.asarray(self._h_fixed),
            self.num_taps,
            self.qformat.frac_bits,
            self.qformat.acc_bits,
        )
        self.state = FirStreamState(
            carry=np.asarray(new_carry, np.int32),
            samples_seen=self.state.samples_seen + x.shape[1],
        )
        return np.asarray(y)

    def flush(self) -> np.ndarray:
        """Emit the final ``center`` outputs by pushing zeros."""
        if self.center == 0:
            return np.zeros((self.channels, 0), np.uint8)
        return self.process(
            np.zeros((self.channels, self.center), np.uint8)
        )


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("num_taps", "frac_bits", "acc_bits"))
def _stream_step(x_i32, carry_i32, h_i32, num_taps, frac_bits, acc_bits):
    if num_taps > 1:
        ext = jnp.concatenate([carry_i32, x_i32], axis=1)
        new_carry = ext[:, -(num_taps - 1):]
    else:
        ext = x_i32
        new_carry = carry_i32
    y = fixed_fir_prehaloed_i32(ext, h_i32, num_taps, frac_bits, acc_bits)
    return y, new_carry


def _stream_step_mxu(x_i32, carry_i32, h, qformat, num_taps):
    """MXU-banded streaming step — bit-identical to :func:`_stream_step`.

    The same-mode zero-padded MXU kernel over the carry-extended block
    computes, on its interior columns, exactly the pre-haloed outputs
    (out[left + j] touches only in-bounds samples, so the zero-pad
    never contributes) — so slicing ``[left : left + S]`` reproduces
    the delay-line contract bit for bit at banded-matmul speed
    (~60× the jnp shifted-MAC core on v5e for 5 taps).
    """
    from warmup_fir_filter_tpu.kernels.dispatch import fir1d_fixed_rows_auto

    center = num_taps // 2
    left = num_taps - 1 - center
    if num_taps > 1:
        ext = jnp.concatenate([carry_i32, x_i32], axis=1)
        new_carry = ext[:, -(num_taps - 1):]
    else:
        ext = x_i32
        new_carry = carry_i32
    y = fir1d_fixed_rows_auto(ext.astype(jnp.uint8), h, qformat)
    return y[:, left : left + x_i32.shape[1]], new_carry


def auto_rows_split(channels: int, width: int, num_taps: int) -> int:
    """Largest row split R (R | width) keeping the MXU band kernel fed.

    Geometry helper for ``rows_split="auto"``: splitting each (C, S)
    block row into R sub-rows with (L−1)-sample intra-block halos (the
    same halo = carry = resume state mechanism used everywhere else)
    re-shapes the block to (C·R, S/R) — the row-rich geometry the
    one-shot headline runs.  R must divide S so sub-rows tile exactly;
    target ≲4096 total rows and sub-rows ≥ max(512, 4·L).

    NOT the default: the r5 on-chip attribution measured the split
    SLOWER end-to-end (4.7 vs 11.7 Gsps sustained at 16ch × 4M) — the
    ``frame_overlap`` windowing pass lowers to the same pathological
    XLA copy the FFT path had to delete in-kernel, and it outweighs
    the grid-starvation it cures.  (The r4 "100× gap" this was built
    for turned out to be per-call retrace overhead in the harness —
    fixed by the compiled-scan cache below; see docs/roofline.md
    "streaming scan attribution".)
    """
    min_width = max(512, 4 * num_taps)
    cap = min(width, 4096 // max(channels, 1))
    for r in range(cap, 1, -1):
        if width % r == 0 and width // r >= min_width:
            return r
    return 1


def _stream_step_mxu_wide(x_i32, carry_i32, h, qformat, num_taps,
                          rows_split):
    """Row-split MXU streaming step — bit-identical to
    :func:`_stream_step` (r5, VERDICT r4 task 4).

    The carry-extended block (C, S+L−1) is framed gather-free into
    (C·R, S/R+L−1) overlapping windows whose margins carry the true
    neighbor samples, run through the same-mode MXU kernel, and the
    interior columns — which by the pre-halo argument equal the global
    outputs — are re-assembled with a pure reshape (window row order
    is (channel-major, sub-row-minor), so no transpose).
    """
    from warmup_fir_filter_tpu.kernels.dispatch import fir1d_fixed_rows_auto
    from warmup_fir_filter_tpu.ops.fftfilt import frame_overlap

    channels, width = x_i32.shape
    assert width % rows_split == 0
    sub = width // rows_split
    center = num_taps // 2
    left = num_taps - 1 - center
    if num_taps > 1:
        ext = jnp.concatenate([carry_i32, x_i32], axis=1)
        new_carry = ext[:, -(num_taps - 1):]
    else:
        ext = x_i32
        new_carry = carry_i32
    win = sub + num_taps - 1
    frames = frame_overlap(ext, win, sub, rows_split)
    frames = frames.reshape(channels * rows_split, win)
    y = fir1d_fixed_rows_auto(frames.astype(jnp.uint8), h, qformat)
    y = y[:, left : left + sub]
    return y.reshape(channels, width), new_carry


def default_emit_checksums(y):
    """Order-sensitive block checksums: three uint32 sums.

    ``[Σy, Σ y·w, Σ y·(w·φ)]`` with ``w = 1..S`` and ``φ`` an odd
    (bijective mod 2³²) Weyl constant, all accumulated **mod 2³²**
    (full 64-bit sums would need x64, disabled by default; two
    independent weighted residues give ~2⁻⁶⁴ combined collision odds
    for the resume/bit-identity gates — ADVICE r4).  The host-side
    mirror formula is ``(y·w).sum() % 2**32`` in any wider dtype.
    """
    yu = y.astype(jnp.uint32)
    w = jax.lax.broadcasted_iota(jnp.uint32, y.shape, y.ndim - 1) \
        + jnp.uint32(1)
    return jnp.stack([
        jnp.sum(yu),
        jnp.sum(yu * w),
        jnp.sum(yu * (w * jnp.uint32(2654435761))),
    ])


#: (block_fn, emit_fn, jitted scan) entries keyed by scan geometry —
#: see the cache note inside :func:`stream_scanned`.  Bounded FIFO:
#: entries pin their closures (and any device buffers they capture)
#: plus a compiled executable, so unbounded growth would leak memory
#: under churned block_fns.
_SCAN_CACHE: dict = {}
_SCAN_CACHE_MAX = 16


def host_emit_checksums(y) -> np.ndarray:
    """Numpy mirror of :func:`default_emit_checksums` (uint64 values
    of the three uint32 residues) for host-side cross-checks."""
    yu = np.asarray(y, np.uint64)
    w = np.arange(1, yu.shape[-1] + 1, dtype=np.uint64)
    mod = np.uint64(1) << np.uint64(32)
    w2 = (w * np.uint64(2654435761)) % mod
    return np.array([
        yu.sum() % mod,
        (yu * w).sum() % mod,
        (yu * w2).sum() % mod,
    ], np.uint64)




def pick_window_split(channels: int, width: int,
                      num_taps: int) -> tuple[int, int] | None:
    """Geometry (sub, g_windows) for the Pallas windowed scan, or None.

    Picks the lane-aligned sub-row width whose window count makes the
    band FIR row-rich (64 ≤ C·R ≤ 8192, sub ≥ max(512, 4·L)); the
    per-program window group is the largest divisor of R ≤ 16.
    """
    from warmup_fir_filter_tpu.kernels.window_copy import (
        window_rows_supported,
    )

    if width % 128 or num_taps > 129:
        return None
    min_sub = max(512, 4 * num_taps)
    best = None
    spt_total = width // 128
    for spt in range(min_sub // 128, spt_total + 1):
        if spt_total % spt:
            continue
        sub = spt * 128
        r = width // sub
        rows = channels * r
        if rows < 64 or rows > 8192:
            continue
        if not window_rows_supported(channels, width, sub, num_taps):
            continue
        if best is None or rows > best[2]:
            g = 1
            for cand in range(min(16, r), 0, -1):
                if r % cand == 0:
                    g = cand
                    break
            best = (sub, g, rows)
    return (best[0], best[1]) if best else None


def _stream_step_windowed(x_i32, carry_i32, h, qformat, num_taps,
                          sub, g_windows):
    """Pallas-windowed MXU streaming step (r5c).

    The window-copy kernel (``kernels/window_copy.py``) builds
    overlapping (R·C, sub+256) u8 rows IN-KERNEL (no XLA framing
    pass); the band FIR then runs row-rich.  Outputs stay in the
    window-major layout — consumed by
    :func:`_emit_windowed_checksums`, which re-indexes with a fused
    iota instead of transposing.  Checksum-equal to the unsplit step
    (asserted in tests and the bench gates).
    """
    from warmup_fir_filter_tpu.kernels.dispatch import fir1d_fixed_rows_auto
    from warmup_fir_filter_tpu.kernels.window_copy import window_rows_pallas

    channels, width = x_i32.shape
    carry_ext = jnp.zeros((channels, 128), jnp.uint8)
    if num_taps > 1:
        carry_ext = carry_ext.at[:, -(num_taps - 1):].set(
            carry_i32.astype(jnp.uint8))
        # Direct slice, NOT concatenate([carry, x])[:, -k:]: XLA lowers
        # that concat as a full materialized copy of the block (256 MB
        # of int32 writes per 4M-sample step — measured 0.39 ms/block,
        # ~25% of the whole scan body; docs/roofline.md r5d).  The
        # slice is free.  Only a block SHORTER than the delay line
        # still needs the old carry's tail.
        k = num_taps - 1
        if width >= k:
            new_carry = x_i32[:, -k:]
        else:
            new_carry = jnp.concatenate(
                [carry_i32, x_i32], axis=1)[:, -k:]
    else:
        new_carry = carry_i32
    win = window_rows_pallas(
        x_i32.astype(jnp.uint8), carry_ext, sub, g_windows,
        interpret=jax.default_backend() != "tpu")
    y_win = fir1d_fixed_rows_auto(win, h, qformat)
    return y_win, new_carry


def _emit_windowed_checksums(y_win, channels: int, sub: int,
                             num_taps: int):
    """:func:`default_emit_checksums` re-indexed for window-major rows.

    Window col ``p`` of window ``r`` is emitted sample
    ``t = r·sub + p − 128 + center`` (valid for
    ``p ∈ [128−center, 128−center+sub)``); masking + weighting with a
    fused iota makes the three sums EQUAL to the (C, S)-layout
    checksums with no slice or transpose.
    """
    center = num_taps // 2
    hl = 128
    yu = y_win.astype(jnp.uint32)
    r_idx = jax.lax.broadcasted_iota(jnp.int32, yu.shape, 0) // channels
    p = jax.lax.broadcasted_iota(jnp.int32, yu.shape, 1)
    valid = (p >= hl - center) & (p < hl - center + sub)
    t = r_idx * sub + p - hl + center
    w = jnp.where(valid, (t + 1).astype(jnp.uint32), jnp.uint32(0))
    yv = jnp.where(valid, yu, jnp.uint32(0))
    return jnp.stack([
        jnp.sum(yv),
        jnp.sum(yv * w),
        jnp.sum(yv * (w * jnp.uint32(2654435761))),
    ])



def stream_scanned(
    stream: "Fir1DStream",
    block_fn,
    num_blocks: int,
    *,
    emit_fn=None,
    start_block: int = 0,
    rows_split: int | None = None,
):
    """Run ``num_blocks`` streaming steps in ONE device program.

    The per-block host round trip of :meth:`Fir1DStream.process` (state
    download + next-block upload, ~30 ms dispatch latency each through
    a remote tunnel) caps sustained throughput at a few Gsps regardless
    of the kernel; for long streams the whole block loop belongs on
    device.  This rolls it into a ``lax.scan``: ``block_fn(b)`` builds
    block ``b`` IN-GRAPH (e.g. a synthetic generator, or a
    ``dynamic_slice`` of a device-resident buffer), the delay-line
    carry stays on device for the whole scan, and only
    ``emit_fn(y_block)`` (default: :func:`default_emit_checksums`,
    three uint32 residues mod 2³²) returns per block — so a
    multi-billion-sample stream runs at kernel speed.

    ``rows_split`` re-shapes each (C, S) block to (C·R, S/R) with
    intra-block halos before the MXU kernel (``_stream_step_mxu_wide``);
    ``"auto"`` picks :func:`auto_rows_split`.  The default is the
    UNSPLIT geometry: on v5e the split's ``frame_overlap`` windowing
    pass lowers to the same pathological XLA copy the FFT path had to
    delete (measured 4.7 vs 11.7 Gsps sustained at 16ch × 4M,
    docs/roofline.md "streaming scan attribution") — the knob stays for
    shapes where a cheap reshape exists.  The emitted blocks and the
    checkpoint state are bit-identical across every ``rows_split``.

    The stream's checkpointable state is updated exactly as if the
    blocks had been fed one by one: resuming a second ``stream_scanned``
    call from a saved :class:`FirStreamState` is bit-identical to one
    uninterrupted run (asserted in tests and bench_streaming.py).

    Returns the stacked ``emit_fn`` outputs (leading axis num_blocks).
    """
    if emit_fn is None:
        emit_fn = default_emit_checksums

    num_taps = stream.num_taps
    frac_bits = stream.qformat.frac_bits
    acc_bits = stream.qformat.acc_bits

    # On TPU the per-block FIR runs the banded MXU kernel (bit-identical
    # contract, see _stream_step_mxu); elsewhere the jnp i32 core.
    use_mxu = jax.default_backend() == "tpu"
    h_raw = stream._h_raw
    qformat = stream.qformat
    probe = jax.eval_shape(block_fn, jnp.int32(0))
    p_channels, p_width = int(probe.shape[0]), int(probe.shape[-1])
    window_geom = None
    if rows_split == "pallas":
        # explicit request (tests/interpret included)
        if emit_fn is not default_emit_checksums:
            raise ValueError(
                "rows_split='pallas' supports only the default emit "
                "(the windowed layout re-indexing is built into it)")
        window_geom = pick_window_split(p_channels, p_width, num_taps)
        if window_geom is None:
            raise ValueError(
                f"no windowed-scan geometry for shape ({p_channels}, "
                f"{p_width}) at {num_taps} taps")
        rows_split = 1  # unused; keep the cache key well-typed
    elif rows_split in (None, "auto") and use_mxu \
            and emit_fn is default_emit_checksums:
        # r5c default: the Pallas window-copy pipeline (in-kernel
        # windowing, row-rich band FIR, iota-reindexed checksums) —
        # checksum-equal to the unsplit step and ~2× faster at the
        # bench geometry.  Only the default emit understands the
        # window-major layout; custom emits fall back.
        window_geom = pick_window_split(p_channels, p_width, num_taps)
    if rows_split == "auto" and window_geom is None:
        rows_split = auto_rows_split(p_channels, p_width, num_taps) \
            if use_mxu else 1
    elif rows_split in (None, "auto"):
        rows_split = 1

    # Compiled-scan cache (r5): a fresh ``jax.jit`` closure per call
    # would RETRACE on every invocation (seconds of host time that the
    # r4/r5 "sustained" numbers silently included); identical
    # (block_fn, emit_fn, geometry, filter) requests reuse one
    # compiled executable.  Strong references to block_fn/emit_fn in
    # the cache entry prevent id-reuse aliasing.  NOTE: the cache keys
    # on ``block_fn`` IDENTITY — callers wanting the reuse must pass a
    # stable function object, not a fresh per-call lambda (a fresh
    # closure always misses and re-traces; the bounded FIFO below just
    # keeps such churn from leaking memory).
    key = (id(block_fn), id(emit_fn), num_blocks, rows_split,
           window_geom, num_taps, frac_bits, acc_bits, use_mxu,
           h_raw.tobytes(), qformat)
    cached = _SCAN_CACHE.get(key)
    if cached is not None and cached[0] is block_fn \
            and cached[1] is emit_fn:
        _run = cached[2]
    else:
        @partial(jax.jit, static_argnames=())
        def _run(carry0, h_i32, b0):
            def body(carry, b):
                x = jnp.asarray(block_fn(b), jnp.int32)
                if window_geom is not None:
                    y_win, carry = _stream_step_windowed(
                        x, carry, h_raw, qformat, num_taps,
                        *window_geom)
                    return carry, _emit_windowed_checksums(
                        y_win, p_channels, window_geom[0], num_taps)
                if use_mxu and rows_split > 1:
                    y, carry = _stream_step_mxu_wide(
                        x, carry, h_raw, qformat, num_taps, rows_split)
                elif use_mxu:
                    y, carry = _stream_step_mxu(
                        x, carry, h_raw, qformat, num_taps)
                else:
                    y, carry = _stream_step(
                        x, carry, h_i32, num_taps, frac_bits, acc_bits)
                return carry, emit_fn(y)
            return jax.lax.scan(
                body, carry0, b0 + jnp.arange(num_blocks, dtype=jnp.int32))

        if len(_SCAN_CACHE) >= _SCAN_CACHE_MAX:
            _SCAN_CACHE.pop(next(iter(_SCAN_CACHE)))
        _SCAN_CACHE[key] = (block_fn, emit_fn, _run)

    carry, emitted = _run(
        jnp.asarray(stream.state.carry),
        jnp.asarray(stream._h_fixed),
        jnp.int32(start_block),
    )
    # ONE batched host transfer for both outputs: a separate
    # ``np.asarray(carry)`` here plus the caller's download of
    # ``emitted`` costs two synchronized tunnel round trips (~30 ms
    # each — 55% of the measured wall at the 4e9-sample bench scale,
    # docs/roofline.md r5d).
    carry, emitted = jax.device_get((carry, emitted))
    block_width = None  # derived below from one traced block
    probe = jax.eval_shape(block_fn, jnp.int32(0))
    block_width = int(probe.shape[-1])
    stream.state = FirStreamState(
        carry=np.asarray(carry, np.int32),
        samples_seen=stream.state.samples_seen + num_blocks * block_width,
    )
    return emitted
