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
                config.resample_down, config.demod_k_f)

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
