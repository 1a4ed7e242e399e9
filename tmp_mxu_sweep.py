"""Experiment: MXU FIR geometry sweep + mixed u8*s8 dot support probe."""
import sys, time
import numpy as np

import jax
import jax.numpy as jnp

from warmup_fir_filter_tpu.kernels.fir_mxu import fir1d_fixed_rows_mxu
from warmup_fir_filter_tpu.models.filters import FILTER_BANK_5TAP
from warmup_fir_filter_tpu.models.golden import fir1d_fixed_golden_rows
from warmup_fir_filter_tpu.utils.benchmarking import chained_throughput

h = np.asarray(FILTER_BANK_5TAP["sharpen"])
rng = np.random.default_rng(0)
BATCH, WIDTH = 19456, 8192
x = rng.integers(0, 256, size=(BATCH, WIDTH), dtype=np.uint8)
x_dev = jax.device_put(jnp.asarray(x))
n = x.size

golden = fir1d_fixed_golden_rows(x[:16], h)

# 1) mixed-precision dot probe: u8 x s8 -> s32
try:
    a = jnp.asarray(rng.integers(0, 256, (256, 128), dtype=np.uint8))
    b = jnp.asarray(rng.integers(-128, 128, (128, 128), dtype=np.int8))
    out = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32))(a, b)
    expect = np.asarray(a, np.int64) @ np.asarray(b, np.int64)
    print("u8xs8 dot:", "EXACT" if np.array_equal(np.asarray(out), expect) else "WRONG")
except Exception as e:
    print("u8xs8 dot failed:", type(e).__name__, str(e)[:200])

for br in (256, 512, 1024):
    for ct in (8, 16, 32, 64):
        try:
            fn = lambda a, br=br, ct=ct: fir1d_fixed_rows_mxu(
                a, h, block_rows=br, col_tiles=ct)
            ok = np.array_equal(np.asarray(fn(jnp.asarray(x[:16]))), golden)
            r = chained_throughput(fn, x_dev)
            print(f"br={br:5d} ct={ct:3d} exact={ok} "
                  f"{n / r['seconds_per_apply'] / 1e9:8.1f} Gsps")
        except Exception as e:
            print(f"br={br:5d} ct={ct:3d} FAILED {type(e).__name__}: {str(e)[:120]}")
