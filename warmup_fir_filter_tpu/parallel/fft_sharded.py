"""Time-sharded FFT overlap-save over a device mesh.

BASELINE.json config 4: "FFT overlap-save equivalent of 63-tap FIR on
16 channels x 10M samples, sharded across chips with halo exchange."
Each device owns a T/n time block of every channel, exchanges the
asymmetric same-mode halo with its neighbors over ICI (``ppermute``, via
:func:`parallel.halo.exchange_halo_1d`), and runs the *local* overlap-
save pipeline on its extended block — the result equals the unsharded
FFT path exactly (same blocks would be formed globally when the local
block length is a multiple of the FFT hop).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from warmup_fir_filter_tpu.ops.fftfilt import frame_overlap, pick_nfft
from warmup_fir_filter_tpu.parallel.halo import exchange_halo_1d


def make_overlap_save_step(
    h,
    *,
    mesh: Mesh,
    time_axis: str = "time",
    channel_axis: str = "data",
    nfft: int | None = None,
    backend: str = "jnp",
    steps: int = 1,
):
    """Build a reusable jitted sharded overlap-save step.

    Returns ``run(x_sharded, seed=0.0) -> (C, T) float32`` — a callable
    holding ONE ``jax.jit`` object, so repeated invocations hit the
    compile cache (a fresh closure per call would re-trace every time,
    paying the 20-90 s tunnel compile per benchmark repetition).

    ``steps > 1`` chains the filter that many times inside the jit
    (shape-preserving (C, T) → (C, T), halo exchange per application) —
    the slope between two chain lengths is the honest per-apply time
    through the async tunnel (``utils/benchmarking.py`` methodology).
    ``seed`` is added to the input in-graph to defeat value-level result
    caching between repetitions.
    """
    if backend not in ("jnp", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    h64 = np.asarray(h, np.float64)
    num_taps = int(h64.size)
    nfft = pick_nfft(num_taps) if nfft is None else nfft
    if nfft < num_taps:
        raise ValueError(f"nfft={nfft} must be >= num_taps={num_taps}")
    center = num_taps // 2
    left_w, right_w = num_taps - 1 - center, center
    step = nfft - (num_taps - 1)

    if backend == "pallas":
        from warmup_fir_filter_tpu.kernels.fft_pallas import (
            _dft_tables,
            _osfilt_fold_tables,
            _osfilt_spectrum,
            _stream_tables,
            _use_interpret,
            factor_nfft,
            stream_kernel_supported,
        )

        # The filter spectrum and DFT tables are real planes (no complex
        # transfer), replicated across the mesh.  Folded + bf16-pre-split
        # on the host (r4) — must happen before the shard_map trace.
        # r5: when the zero-copy stream kernel supports (L, off=left_w),
        # each shard runs it directly on its halo-extended block — the
        # ``off`` contract emits the block interior with no framing,
        # padding, or slicing pass (5× on v5e, docs/roofline.md).
        use_stream = stream_kernel_supported(num_taps, left_w)
        if use_stream:
            stream_tables = _stream_tables(h64, num_taps, left_w)
        else:
            hc, hs = _osfilt_spectrum(h64, nfft)
            tables = _osfilt_fold_tables(hc, hs, _dft_tables(nfft),
                                         *factor_nfft(nfft))
        interpret = _use_interpret()

    def _local_filter(segments, h_f32):
        """(C_loc, B, nfft) frames → (C_loc, B, step) filtered blocks."""
        if backend == "jnp":
            # Complex host→device transfers are not supported on some
            # backends; build the filter spectrum in-graph from real taps.
            h_freq = jnp.fft.rfft(h_f32, n=nfft)
            spec = jnp.fft.rfft(segments, axis=-1)
            y = jnp.fft.irfft(spec * h_freq, n=nfft, axis=-1)
            return y[:, :, num_taps - 1 :]
        from warmup_fir_filter_tpu.kernels.fft_pallas import (
            _auto_block_rows,
            _osfilt_natural,
            _round_up,
        )

        c_loc, blocks = segments.shape[0], segments.shape[1]
        flat = segments.reshape(c_loc * blocks, nfft)
        rows = _auto_block_rows(nfft, flat.shape[0])
        b_pad = _round_up(flat.shape[0], rows)
        flat = jnp.pad(flat, ((0, b_pad - flat.shape[0]), (0, 0)))
        y = _osfilt_natural(flat, hc, hs, tables, nfft, rows, interpret)
        y = y[: c_loc * blocks, num_taps - 1 :]
        return y.reshape(c_loc, blocks, step)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(channel_axis, time_axis), P(), P()),
        out_specs=P(channel_axis, time_axis),
        # pallas_call emits ShapeDtypeStructs without varying-mesh-axes
        # metadata; vma checking would reject the kernel-backed body.
        check_vma=False,
    )
    def _sharded(x_loc, h_f32, seed):
        local_time = x_loc.shape[1]
        num_blocks = -(-local_time // step)

        def apply(y_loc):
            # Halo exchange gives each shard the same neighborhood it
            # would see inside the global zero-padded stream.
            x_ext = exchange_halo_1d(
                y_loc, axis_name=time_axis, left_width=left_w,
                right_width=right_w,
            )
            if backend == "pallas" and use_stream:
                from warmup_fir_filter_tpu.kernels.fft_pallas import (
                    _osfilt_stream,
                    _stream_r_windows,
                )

                t = {k: jnp.asarray(v) for k, v in stream_tables.items()}
                return _osfilt_stream(
                    x_ext, t, num_taps, left_w, local_time,
                    _stream_r_windows(y_loc.shape[0]), interpret)
            # Local overlap-save over the extended block: segment b
            # covers ext indices [b·step, b·step + nfft); local output t
            # lives at ext index t + left_w, and y[t] needs
            # ext[t ... t + L - 1], i.e. the standard
            # discard-first-(L-1) alignment.  Last segment ends at
            # (num_blocks-1)·step + nfft = num_blocks·step + (L-1) in
            # extended coordinates.
            pad_right = num_blocks * step + (num_taps - 1) - x_ext.shape[1]
            xp = jnp.pad(x_ext, ((0, 0), (0, max(0, pad_right))))
            segments = frame_overlap(xp, nfft, step, num_blocks)
            valid = _local_filter(segments, h_f32)
            out = valid.reshape(y_loc.shape[0], num_blocks * step)
            return out[:, :local_time]

        y0 = x_loc + seed
        if steps == 1:
            return apply(y0)
        from jax import lax

        return lax.fori_loop(0, steps, lambda i, y: apply(y), y0)

    jitted = jax.jit(_sharded)
    h_f32 = jnp.asarray(h64, jnp.float32)

    def run(x_sharded, seed: float = 0.0):
        return jitted(x_sharded, h_f32, jnp.float32(seed))

    return run


def fir_overlap_save_sharded(
    x,
    h,
    *,
    mesh: Mesh,
    time_axis: str = "time",
    channel_axis: str = "data",
    nfft: int | None = None,
    backend: str = "jnp",
) -> jax.Array:
    """Float32 same-mode FIR via FFT overlap-save, (C, T) sharded C×T.

    ``backend="pallas"`` runs each shard's local overlap-save through the
    fused matmul-FFT kernel (``kernels/fft_pallas.py``) instead of
    ``jnp.fft`` — same sharding, same halo exchange, same result.
    """
    run = make_overlap_save_step(
        h, mesh=mesh, time_axis=time_axis, channel_axis=channel_axis,
        nfft=nfft, backend=backend,
    )
    x_f32 = jnp.asarray(x, jnp.float32)
    channels, time = x_f32.shape
    for size, axis in ((channels, channel_axis), (time, time_axis)):
        if size % mesh.shape[axis]:
            raise ValueError(
                f"Dimension {size} not divisible by mesh axis "
                f"{axis!r}={mesh.shape[axis]}."
            )
    x_sharded = jax.device_put(
        x_f32, NamedSharding(mesh, P(channel_axis, time_axis))
    )
    return run(x_sharded)
