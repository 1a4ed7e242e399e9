"""Backend auto-dispatch for the bit-exact fixed-point FIR.

Measured single-chip throughput on the 5-tap Q4.12 headline workload
(TPU v5e, recorded artifacts: ``BENCH_r*.json`` for 5-tap via
``bench.py``; ``BENCH_TAPS_r04.json`` for the tap sweep via
``bench_taps.py`` — methodology and roofline context in
``docs/roofline.md``):

================  ==========  ===========  ============
path              5-tap Gsps  63-tap Gsps  257-tap Gsps
================  ==========  ===========  ============
MXU band matmul     313-337       ~250         ~240
Pallas VPU MAC         68          ~5           —
jnp/XLA                27          ~3           —
FFT overlap-save      ~12         12.3         ~12  (float, not bit-exact)
================  ==========  ===========  ============

(Every band-kernel figure is backed by a committed artifact; the
63/257/1001/4096-tap rows are re-recorded each round by
``bench_taps.py``.  The FFT figure is the r5 stream kernel's
chained-loop number — the r3/r4 2.4 Gsps plateau was the XLA framing
passes, not the kernel; the granularity sweep that refuted both prior
attributions and the stream-kernel design are in the FFT sections of
``docs/roofline.md``.)  The int8 MXU eats taps
nearly for free (adding taps only adds band density and digit planes
under a memory-bound op), so the direct MXU kernel beats the FFT path
at 63 taps by ~100× *and* stays bit-exact — the FFT path is the float
*model* path and the only option beyond the windowed-band kernel's
4096-tap limit.
"""

from __future__ import annotations

import jax

from warmup_fir_filter_tpu.kernels.fir_mxu import (
    MAX_TAPS,
    MAX_TAPS_WINDOWED,
    fir1d_fixed_rows_mxu,
    fir1d_fixed_rows_mxu_window,
)
from warmup_fir_filter_tpu.kernels.fir_pallas import fir1d_fixed_rows_pallas
from warmup_fir_filter_tpu.ops.qformat import QFormat


def fir1d_fixed_rows_auto(x_u8, h, qformat: QFormat = QFormat()) -> jax.Array:
    """Bit-exact fixed FIR via the fastest available backend.

    Tri-tile MXU band-matmul kernel when the tap count fits its band
    (L ≤ 257 = ``fir_mxu.MAX_TAPS``); the windowed-band MXU kernel
    (chunked contiguous-window matmuls, still >100 Gsps) up to
    L ≤ ``MAX_TAPS_WINDOWED`` = 4096; the Pallas VPU kernel beyond.
    All are bit-exact against the golden contract for every tpu-native
    QFormat; callers needing acc_bits > 32 must use
    ``models.golden.fir1d_fixed_golden_rows``.
    """
    import numpy as np

    num_taps = int(np.asarray(h).size)
    if num_taps <= MAX_TAPS:
        return fir1d_fixed_rows_mxu(x_u8, h, qformat)
    if num_taps <= MAX_TAPS_WINDOWED:
        return fir1d_fixed_rows_mxu_window(x_u8, h, qformat)
    return fir1d_fixed_rows_pallas(x_u8, h, qformat)


def fir2d_fixed_auto(x_u8, h, qformat: QFormat = QFormat()) -> jax.Array:
    """Bit-exact fixed 2-D FIR via the fastest available backend.

    MXU padded-frame kernels (overlapped frame: ~156-172 Gsps
    run-to-run for 5×5 on v5e — recorded value in the round's
    BENCH_2D_r*.json; tri-tile plain frame beyond Lc = 97, up to
    Lc ≤ 257 = ``MAX_TAPS``) when the column tap count fits a band;
    else the jnp path.  ``fir2d_fixed_mxu`` picks the frame layout.
    """
    import numpy as np

    from warmup_fir_filter_tpu.kernels.fir2d_mxu import fir2d_fixed_mxu

    h = np.asarray(h)
    if h.ndim == 2 and h.shape[1] <= MAX_TAPS:
        return fir2d_fixed_mxu(x_u8, h, qformat)
    from warmup_fir_filter_tpu.ops.fir2d import fir2d_fixed_jnp

    return fir2d_fixed_jnp(x_u8, h, qformat)
