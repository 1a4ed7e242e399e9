"""Flagship DSP chain: resample → channelize → FM demod.

BASELINE.json config 5 ("full chain: polyphase 2/3 resample + 63-tap
channelizer + FM demod").  The chain operates on complex baseband rows
carried as split I/Q float planes of shape (channels, time) and is pure
row-wise dataflow, so it shards as data parallelism over a mesh axis;
the time-sharded variants of the FIR stages live in ``parallel/``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from warmup_fir_filter_tpu.ops.demod import fm_demodulate
from warmup_fir_filter_tpu.ops.fftfilt import fir_overlap_save
from warmup_fir_filter_tpu.ops.resample import design_lowpass, resample_poly


@dataclasses.dataclass(frozen=True)
class ChainConfig:
    """Static configuration of the DSP chain."""

    resample_up: int = 2
    resample_down: int = 3
    resample_taps: int = 63
    channelizer_taps: int = 63
    channelizer_cutoff: float = 0.25
    demod_k_f: float = 0.05
    use_fft_channelizer: bool = True
    #: "auto" → on TPU, the r4 single-pass fused chain kernel
    #: (``kernels/chain_fused.py``: resample+channelize+demod in one
    #: Pallas pass, 3× less HBM traffic than the staged pipeline)
    #: when the config supports it, else the staged MXU path; "fused"
    #: forces the fused kernel; "mxu" (staged f32 MXU band kernel) /
    #: "pallas" (fused matmul-FFT) / "jnp" (jnp.fft) force a staged
    #: channelizer backend.
    channelizer_backend: str = "auto"
    #: Numerics of the fused kernel: "bf16x3" (default, ~114 dB),
    #: "highest" (strict f32), or "bf16" (r5 storage mode: bf16 I/Q +
    #: scratch, single-pass band dots — ~2× throughput at ~54 dB vs
    #: the f32 chain on constant-envelope signals; opt-in).
    fused_precision: str = "bf16x3"

    def resample_filter(self) -> np.ndarray:
        cutoff = 0.9 / max(self.resample_up, self.resample_down)
        return design_lowpass(self.resample_taps, cutoff,
                              gain=self.resample_up)

    def channelizer_filter(self) -> np.ndarray:
        return design_lowpass(self.channelizer_taps, self.channelizer_cutoff)


def chain_forward(re, im, config: ChainConfig = ChainConfig()) -> jax.Array:
    """Run the full chain on (C, T) I/Q rows → (C, T') message rows."""
    h_rs = config.resample_filter()
    h_ch = config.channelizer_filter()

    # r4 fast path: the whole chain in one Pallas pass (auto on TPU).
    backend = config.channelizer_backend
    if backend == "fused" and not config.use_fft_channelizer:
        # A forced 'fused' request must not silently fall through to the
        # staged jnp ideal channelizer (ADVICE r4).
        raise ValueError(
            "channelizer_backend='fused' requires use_fft_channelizer=True "
            "(the fused kernel implements the FFT-channelizer contract)")
    if backend in ("auto", "fused") and config.use_fft_channelizer:
        from warmup_fir_filter_tpu.kernels.chain_fused import (
            chain_forward_fused,
            chain_fused_supported,
        )

        channels = jnp.asarray(re).shape[0]
        supported = chain_fused_supported(
            int(channels), config.resample_up, config.resample_down,
            config.resample_taps, config.channelizer_taps)
        if backend == "fused" and not supported:
            raise ValueError(
                "channelizer_backend='fused' but the fused chain kernel "
                "does not support this config (see chain_fused_supported)")
        if supported and (backend == "fused"
                          or jax.default_backend() == "tpu"):
            return chain_forward_fused(
                re, im, h_rs, h_ch, config.resample_up,
                config.resample_down, config.demod_k_f,
                precision=config.fused_precision)

    # One resampler pass over both I/Q planes stacked as extra rows —
    # row-poor (C, T) inputs underuse the VPU sublanes, and one call
    # halves the fixed stage overheads.
    channels = jnp.asarray(re).shape[0]
    both_rs = resample_poly(
        jnp.concatenate([jnp.asarray(re, jnp.float32),
                         jnp.asarray(im, jnp.float32)], axis=0),
        h_rs, config.resample_up, config.resample_down,
    )
    re_rs, im_rs = both_rs[:channels], both_rs[channels:]

    if config.use_fft_channelizer:
        backend = config.channelizer_backend
        if backend == "auto":
            backend = "mxu" if config.channelizer_taps <= 257 else (
                "pallas" if jax.default_backend() == "tpu" else "jnp")
        if backend == "mxu":
            from warmup_fir_filter_tpu.kernels.fir_float_mxu import (
                fir1d_ideal_rows_mxu,
            )

            # One MXU pass over both I/Q planes (stacked as extra rows).
            both = fir1d_ideal_rows_mxu(both_rs, h_ch)
            re_ch, im_ch = both[:channels], both[channels:]
        elif backend == "pallas":
            from warmup_fir_filter_tpu.kernels.fft_pallas import (
                fir_overlap_save_pallas,
            )

            re_ch = fir_overlap_save_pallas(re_rs, h_ch)
            im_ch = fir_overlap_save_pallas(im_rs, h_ch)
        elif backend == "jnp":
            re_ch = fir_overlap_save(re_rs, h_ch)
            im_ch = fir_overlap_save(im_rs, h_ch)
        else:
            raise ValueError(
                f"unknown channelizer_backend {config.channelizer_backend!r}"
            )
    else:
        from warmup_fir_filter_tpu.ops.fir1d import fir1d_ideal_rows_jnp

        re_ch = fir1d_ideal_rows_jnp(re_rs, h_ch)
        im_ch = fir1d_ideal_rows_jnp(im_rs, h_ch)

    return fm_demodulate(re_ch, im_ch, config.demod_k_f)


def chain_forward_sharded(
    re,
    im,
    config: ChainConfig = ChainConfig(),
    *,
    mesh: Mesh,
    channel_axis: str = "data",
) -> jax.Array:
    """Data-parallel chain: channels sharded over ``channel_axis``.

    Every stage is row-independent, so the sharded run is elementwise
    identical to the single-device run — asserted in tests.
    """
    channels = np.asarray(re).shape[0]
    if channels % mesh.shape[channel_axis]:
        raise ValueError(
            f"channels={channels} not divisible by mesh axis "
            f"{channel_axis!r}={mesh.shape[channel_axis]}."
        )
    sharding = NamedSharding(mesh, P(channel_axis, None))
    re_s = jax.device_put(jnp.asarray(re, jnp.float32), sharding)
    im_s = jax.device_put(jnp.asarray(im, jnp.float32), sharding)

    # shard_map, not sharded-jit: each device runs the full chain on its
    # local channel rows (row-parallel is exact).  Under a plain
    # sharded jit the SPMD partitioner's handling of the fused-chain
    # Pallas call was observed to perturb results at shard seams (r4);
    # with shard_map the kernel sees only local rows and the fused
    # fast path engages per-device exactly when the LOCAL channel count
    # supports it.
    spec = P(channel_axis, None)

    # check_vma=False: the Pallas calls inside declare out_shapes with
    # no varying-mesh-axes annotation; the chain is purely row-local so
    # there is nothing cross-device to check.
    @partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
        check_vma=False)
    def _run(re_in, im_in):
        return chain_forward(re_in, im_in, config)

    return jax.jit(_run)(re_s, im_s)


#: Compiled time-sharded chain executables (bounded FIFO; see the
#: cache note inside chain_forward_time_sharded).
_TIME_SHARDED_CACHE: dict = {}


def chain_forward_time_sharded(
    re,
    im,
    config: ChainConfig = ChainConfig(),
    *,
    mesh: Mesh,
    time_axis: str = "time",
    channel_axis: str | None = None,
    halo_mult: int = 4,
) -> jax.Array:
    """FUSED chain sharded along TIME (r5, VERDICT r4 task 5).

    Each shard halo-extends its input block by ``H_in = 128·down·
    halo_mult`` samples per side over ICI (``exchange_halo_1d``; zeros
    at the stream ends — identical to the kernel's own zero-pad), runs
    ``chain_forward_fused`` on the extended block, and keeps the
    interior ``H_out = 128·up·halo_mult`` onward.  Because the fused
    kernel's band matrices are lane-tile-periodic and both H_in and the
    per-shard lengths are tile- and phase-aligned (constraints below),
    every retained output is computed from the *same operand windows in
    the same order* as the single-device run — the result is
    BIT-IDENTICAL, not merely close (asserted in tests and the dryrun).

    Constraints: ``T % n_shards == 0``; the local length must keep the
    polyphase phase (``T_local % down == 0``) and the output tile grid
    (``T_local·up/down % 128 == 0``) aligned across shards.
    ``channel_axis`` optionally shards channels too (row-local, exact).
    """
    from jax import lax

    from warmup_fir_filter_tpu.kernels.chain_fused import (
        build_resample_band,
        chain_fused_supported,
        chain_forward_fused,
    )
    from warmup_fir_filter_tpu.parallel.halo import exchange_halo_1d

    up, down = config.resample_up, config.resample_down
    h_rs = config.resample_filter()
    h_ch = config.channelizer_filter()
    re = jnp.asarray(re, jnp.float32)
    im = jnp.asarray(im, jnp.float32)
    channels, time = re.shape
    n_t = mesh.shape[time_axis]
    n_c = mesh.shape[channel_axis] if channel_axis else 1
    if channels % max(n_c, 1) or time % n_t:
        raise ValueError(
            f"(C, T)=({channels}, {time}) not divisible by mesh "
            f"({n_c}, {n_t})")
    t_local = time // n_t
    if t_local % down or (t_local * up // down) % 128:
        raise ValueError(
            f"T_local={t_local} must be divisible by down={down} with "
            f"T_local·up/down a multiple of 128 (tile/phase alignment)")
    h_in = 128 * down * halo_mult
    if h_in > t_local:
        # exchange_halo_1d would silently CLAMP the halo slice
        # (x[..., -w:] returns the whole block when w > width) and the
        # retained window below would be misaligned — fail loudly.
        raise ValueError(
            f"halo width {h_in} exceeds T_local={t_local}; use more "
            f"samples per shard or a smaller halo_mult")
    if not chain_fused_supported(channels // max(n_c, 1), up, down,
                                 h_rs.size, h_ch.size):
        raise ValueError("config not supported by the fused chain kernel")
    out_local = t_local * up // down
    h_out = 128 * up * halo_mult

    # Reach check: the first/last retained output tile must read only
    # real (exchanged) samples, so the kernel's own edge zero-masks
    # fire exclusively inside the discarded halo region.
    _, k_rows, ds, beta0, j_count = build_resample_band(
        np.asarray(h_rs, np.float64), up, down)
    first_read = beta0 - (j_count - 1)
    q_min = h_out // 128 - 2   # leftmost rs tile any retained output uses
    q_max = (h_out + out_local) // 128 + 1   # rightmost (exclusive-ish)
    ext_len = t_local + 2 * h_in
    if q_min * ds + first_read < 0 or \
            q_max * ds + first_read + k_rows > ext_len:
        raise ValueError(
            f"halo_mult={halo_mult} too small for this geometry "
            f"(ds={ds}, k_rows={k_rows}, first_read={first_read})")

    spec = P(channel_axis, time_axis)
    sharding = NamedSharding(mesh, spec)
    re_s = jax.device_put(re, sharding)
    im_s = jax.device_put(im, sharding)

    # One compiled executable per (mesh, config, geometry): a fresh
    # jit per call would RETRACE + recompile the sharded Pallas kernel
    # every invocation (the same per-call-retrace class of bug the r5
    # streaming-scan cache fixed; 20-90 s per compile on the tunnel).
    key = (mesh, config, time_axis, channel_axis, halo_mult, re.shape)
    run = _TIME_SHARDED_CACHE.get(key)
    if run is None:
        @partial(jax.shard_map, mesh=mesh, in_specs=(spec, spec),
                 out_specs=spec, check_vma=False)
        def _run(re_l, im_l):
            re_ext = exchange_halo_1d(re_l, axis_name=time_axis,
                                      left_width=h_in, right_width=h_in)
            im_ext = exchange_halo_1d(im_l, axis_name=time_axis,
                                      left_width=h_in, right_width=h_in)
            # Global resampled-space valid window in local ext
            # coordinates: the kernel zero-pads the resampled stream
            # exactly where the single-device run does (bit-equality
            # at stream edges).
            s_idx = jax.lax.axis_index(time_axis)
            lo = h_out - s_idx * out_local
            hi = h_out + out_local * n_t - s_idx * out_local
            y_ext = chain_forward_fused(
                re_ext, im_ext, h_rs, h_ch, up, down, config.demod_k_f,
                precision=config.fused_precision,
                rs_bounds=jnp.stack([lo, hi]))
            y = lax.slice_in_dim(y_ext, h_out, h_out + out_local, axis=1)
            # The global first sample has no predecessor → 0; on every
            # other shard the true predecessor came in with the halo.
            gpos = (jax.lax.axis_index(time_axis) * out_local
                    + jax.lax.broadcasted_iota(jnp.int32, y.shape, 1))
            return jnp.where(gpos == 0, jnp.float32(0.0), y)

        run = jax.jit(_run)
        if len(_TIME_SHARDED_CACHE) >= 16:
            _TIME_SHARDED_CACHE.pop(next(iter(_TIME_SHARDED_CACHE)))
        _TIME_SHARDED_CACHE[key] = run
    return run(re_s, im_s)
