"""Measure the achievable HBM wall of this chip (docs/roofline.md).

BASELINE.json's north star asks for ">80% of speed-of-light" on the
5-tap fixed FIR.  The datasheet SoL for a 2-bytes-per-sample pass on a
TPU v5e is 819 GB/s / 2 B = 409.5 Gsps — but no real pass reaches the
datasheet number.  This harness sweeps the cheapest possible passes to
establish the *measured* wall that `bench.py`'s ``wall_fraction`` is
reported against:

- ``pallas_copy``: in-place aliased Pallas block copy (pure DMA in+out,
  zero compute) across block-row sizes — the hardware+runtime wall for
  the FIR's exact dataflow.
- ``xla_xor``: one fused XLA elementwise pass (`x ^ 1`).
- ``widen_narrow``: `u8 → int32 (+1, clip) → u8` — the FIR's epilogue
  dataflow without the matmuls.
- ``f32_scale``: `x * 1.0001` over an equal-byte f32 array — bandwidth
  measured through 4-byte lanes for cross-checking GB/s.
- ``fir_mxu``: the real kernel, block-row sweep included.

Every probe is timed with the chained-slope harness
(``utils/benchmarking.chained_throughput``) — the only honest method
through the axon tunnel.  Prints ONE JSON line; run with an idle host
(concurrent CPU load corrupts tunnel timing, see memory notes).

Usage: ``python bench_roofline.py [--sizes-mb 40,160,640] [--quick]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np

DATASHEET_GBPS = 819.0
WIDTH = 8192


def _pallas_copy_fn(block_rows: int):
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    @functools.partial(jax.jit, static_argnames=("br",))
    def run(x, br):
        batch, n = x.shape
        spec = pl.BlockSpec((br, n), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(batch // br,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((batch, n), jnp.uint8),
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x)

    return lambda a: run(a, block_rows)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes-mb", default="40,160,640")
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--hlo-check", action="store_true",
                        help="grep the chained FIR HLO for residual copies")
    args = parser.parse_args()
    sizes_mb = [int(s) for s in args.sizes_mb.split(",")]
    if args.quick:
        sizes_mb = sizes_mb[:1]

    import jax
    import jax.numpy as jnp

    from warmup_fir_filter_tpu.kernels.fir_mxu import fir1d_fixed_rows_mxu
    from warmup_fir_filter_tpu.models.filters import FILTER_BANK_5TAP
    from warmup_fir_filter_tpu.utils.benchmarking import chained_throughput

    h = np.asarray(FILTER_BANK_5TAP["sharpen"])
    rng = np.random.default_rng(3)

    results: dict = {"device": str(jax.devices()[0]),
                     "datasheet_gbps": DATASHEET_GBPS,
                     "datasheet_gsps_2B": DATASHEET_GBPS / 2.0,
                     "probes": {}}
    start = time.perf_counter()

    if args.hlo_check:
        # Compile the same chained loop the bench times and count copies
        # feeding the custom call (the round-2 2x tax, memory:
        # pallas-loop-copy-tax).
        from jax import lax

        x = jnp.zeros((1024, WIDTH), jnp.uint8)

        def chained(x0):
            return lax.fori_loop(
                0, 8, lambda i, y: fir1d_fixed_rows_mxu(y, h), x0)

        txt = jax.jit(chained).lower(x).compile().as_text()
        n_copies = sum(
            1 for line in txt.splitlines()
            if " copy(" in line and "u8[1024,8192]" in line
        )
        results["hlo_fullsize_copies_in_loop"] = n_copies

    for mb in sizes_mb:
        batch = (mb * 1024 * 1024) // WIDTH
        batch = (batch // 1024) * 1024 or 128
        x = rng.integers(0, 256, size=(batch, WIDTH), dtype=np.uint8)
        x_dev = jax.device_put(jnp.asarray(x))
        nbytes = x.size  # u8
        entry: dict = {"shape": [batch, WIDTH], "mb": nbytes / 1e6}

        def record(name, fn, bytes_per_elem=2.0, xd=x_dev):
            try:
                r = chained_throughput(fn, xd)
                gsps = r["samples_per_second"] / 1e9
                entry[name] = {
                    "gsps": round(gsps, 1),
                    "gbps": round(gsps * bytes_per_elem, 1),
                }
            except Exception as exc:  # noqa: BLE001 — probes are independent
                entry[name] = {"error": str(exc)[:200]}

        for br in (256, 512, 1024, 2048):
            if br <= batch:
                record(f"pallas_copy_br{br}", _pallas_copy_fn(br))
        record("xla_xor", lambda a: a ^ jnp.uint8(1))
        record("widen_narrow",
               lambda a: (a.astype(jnp.int32) + 1).clip(0, 255)
               .astype(jnp.uint8))
        for br in (256, 512, 1024):
            if br <= batch:
                record(f"fir_mxu_br{br}",
                       lambda a, br=br: fir1d_fixed_rows_mxu(
                           a, h, block_rows=br))
        record("fir_mxu_auto", lambda a: fir1d_fixed_rows_mxu(a, h))

        # f32 pass over the same byte count: 4 B/elem each way = 8 B/elem.
        xf = jax.device_put(
            jnp.asarray(rng.standard_normal((batch // 4, WIDTH)),
                        jnp.float32))
        try:
            r = chained_throughput(lambda a: a * 1.0001, xf)
            gbps = r["samples_per_second"] * 8.0 / 1e9
            entry["f32_scale"] = {"gbps": round(gbps, 1)}
        except Exception as exc:  # noqa: BLE001
            entry["f32_scale"] = {"error": str(exc)[:200]}

        results["probes"][f"{mb}MB"] = entry

    results["elapsed_s"] = round(time.perf_counter() - start, 1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
