"""Probe which mask formulations Mosaic can lower on (BR, W) u8 blocks."""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR, W = 64, 512


def try_kernel(name, body):
    def kern(x_ref, o_ref):
        o_ref[:] = body(x_ref)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(2,),
            in_specs=[pl.BlockSpec((BR, W), lambda t: (0, t),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BR, W), lambda t: (0, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BR, 2 * W), jnp.uint8),
        )(x)

    x = jnp.zeros((BR, 2 * W), jnp.uint8)
    try:
        np.asarray(run(x))
        print(f"{name}: OK")
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name}: FAIL {msg}")


def m_static(x_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (BR, W), 1)
    return jnp.where(col < 300, x_ref[:], jnp.uint8(0))


def m_dynamic(x_ref):
    t = pl.program_id(0)
    col = jax.lax.broadcasted_iota(jnp.int32, (BR, W), 1)
    return jnp.where(col < 1000 - t * W, x_ref[:], jnp.uint8(0))


def m_dynamic_full(x_ref):
    t = pl.program_id(0)
    col = jax.lax.broadcasted_iota(jnp.int32, (BR, W), 1)
    bound = jnp.full((BR, W), 1000 - t * W, jnp.int32)
    return jnp.where(col < bound, x_ref[:], jnp.uint8(0))


def m_dynamic_i32(x_ref):
    t = pl.program_id(0)
    col = jax.lax.broadcasted_iota(jnp.int32, (BR, W), 1)
    xi = x_ref[:].astype(jnp.int32)
    return jnp.where(col < 1000 - t * W, xi, 0).astype(jnp.uint8)


def m_mult_u8(x_ref):
    t = pl.program_id(0)
    col = jax.lax.broadcasted_iota(jnp.int32, (BR, W), 1)
    keep = (col < 1000 - t * W).astype(jnp.uint8)
    return x_ref[:] * keep


def m_select_scalarfold(x_ref):
    # fold dynamic part into the iota instead of the bound
    t = pl.program_id(0)
    col = jax.lax.broadcasted_iota(jnp.int32, (BR, W), 1) + t * W
    return jnp.where(col < 1000, x_ref[:], jnp.uint8(0))


for nm, fn in [("static_u8_where", m_static),
               ("dynamic_u8_where", m_dynamic),
               ("dynamic_full_bound", m_dynamic_full),
               ("dynamic_i32_where", m_dynamic_i32),
               ("mult_u8_mask", m_mult_u8),
               ("iota_plus_scalar", m_select_scalarfold)]:
    try_kernel(nm, fn)
