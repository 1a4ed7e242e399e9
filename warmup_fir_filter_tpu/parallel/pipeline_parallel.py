"""Pipeline parallelism: DSP-chain stages on distinct devices.

The PP axis of SURVEY.md §2.3: the reference's 5-stage vector pipeline
and the north-star signal chain (resample → channelize → demod) are
linear stage graphs; here each stage is jit-compiled *onto its own
device* and a stream of microbatches flows through them.  JAX's async
dispatch provides the overlap: submitting microbatch ``m`` to stage
``s`` returns immediately, so stage ``s`` computes ``m`` while stage
``s+1`` computes ``m-1`` — the classic 1F pipeline schedule — with
device-to-device transfers handled by ``jax.device_put``.

On a single-chip environment all stages land on one device and the
executor degrades gracefully to sequential execution with identical
results (asserted in tests).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax


class PipelinedChain:
    """Run a linear chain of stage functions across a device list."""

    def __init__(
        self,
        stages: Sequence[Callable],
        devices: Sequence[jax.Device] | None = None,
    ):
        if not stages:
            raise ValueError("stages must not be empty")
        available = list(jax.devices()) if devices is None else list(devices)
        if not available:
            raise ValueError("no devices available")
        self._devices = [
            available[i % len(available)] for i in range(len(stages))
        ]
        # Stage placement rides the device_put of each stage's input:
        # jit follows its argument's device (committed arrays).
        self._stages = [jax.jit(stage) for stage in stages]

    @property
    def placements(self) -> list[jax.Device]:
        return list(self._devices)

    def run_microbatches(self, microbatches: Sequence) -> list:
        """Push all microbatches through the pipeline; returns outputs.

        Every dispatch is asynchronous, so while stage s processes
        microbatch m, stage s-1 is already processing m+1.
        """
        # In-flight values per microbatch, advanced stage by stage in
        # submission order (device queues preserve ordering per device).
        results = []
        for batch in microbatches:
            value = batch
            for stage, device in zip(self._stages, self._devices):
                value = jax.device_put(value, device)
                value = stage(value)
            results.append(value)
        return [jax.device_get(v) for v in results]
