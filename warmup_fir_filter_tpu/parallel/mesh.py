"""Device mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: dict[str, int] | None = None,
    *,
    devices=None,
) -> Mesh:
    """Build a named :class:`jax.sharding.Mesh`.

    Args:
        axis_sizes: ordered {axis_name: size}; sizes must multiply to the
            device count. Default: all devices on one ``"data"`` axis.
        devices: explicit device list (default ``jax.devices()``).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if not axis_sizes:
        axis_sizes = {"data": len(devices)}
    sizes = tuple(axis_sizes.values())
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(
            f"Mesh axes {axis_sizes} need {total} devices, have {len(devices)}."
        )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axis_sizes.keys()))
