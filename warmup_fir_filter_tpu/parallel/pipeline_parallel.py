"""Pipeline parallelism: DSP-chain stages on distinct devices.

The PP axis of SURVEY.md §2.3: the reference's 5-stage vector pipeline
and the north-star signal chain (resample → channelize → demod) are
linear stage graphs; here each stage is jit-compiled *onto its own
device* and a stream of microbatches flows through them in the classic
1F schedule.

Two mechanisms make the overlap real (not just asserted):

- **Interleaved tick submission**: at tick ``t`` the executor submits
  stage ``s`` of microbatch ``t - s`` for every stage, deepest stage
  first — so device queues hold at most one microbatch per stage and
  every device has work as soon as its dependency exists.  JAX's async
  dispatch turns the per-device queues into actual concurrency; the
  device-to-device ``jax.device_put`` edges are themselves async and
  dependency-ordered.
- **Bounded in-flight window**: at most ``max_in_flight`` microbatches
  may be between submission and retirement; beyond that the executor
  blocks on the oldest output before admitting a new microbatch.  This
  caps activation memory at ``O(window · stages)`` buffers instead of
  ``O(num_microbatches)`` — the difference between a pipeline and a
  flood.

Overlap is *measured* (``tests/test_pipeline_parallel_synth.py``): with
sleep-weighted stages on the virtual device mesh the pipelined schedule
must beat the forced-sequential one by the theoretical ratio
``T·S / (T + S - 1)`` within tolerance; the measured number is recorded
in ``SCALING_r*.json`` by ``bench_scaling.py``.

On a single-chip environment all stages land on one device and the
executor degrades gracefully to sequential execution with identical
results (asserted in tests).
"""

from __future__ import annotations

from collections import deque
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

    def run_microbatches(
        self,
        microbatches: Sequence,
        *,
        max_in_flight: int | None = None,
        force_sequential: bool = False,
    ) -> list:
        """Push all microbatches through the pipeline; returns outputs.

        Args:
            microbatches: inputs to stage 0, processed in order.
            max_in_flight: bound on microbatches between submission and
                retirement (default ``len(stages) + 1`` — enough to keep
                every stage busy plus one transfer in flight).  Beyond
                the bound the executor blocks on the oldest output.
            force_sequential: synchronize after every stage (defeats all
                overlap).  Exists so tests/benches can *measure* the
                pipelining gain instead of assuming it.
        """
        num_stages = len(self._stages)
        num_batches = len(microbatches)
        if max_in_flight is None:
            max_in_flight = num_stages + 1
        if max_in_flight < 1:
            raise ValueError(f"max_in_flight must be >= 1, got {max_in_flight}")

        # state[m] = activation of microbatch m after its last submitted
        # stage; populated when m is admitted, popped at retirement.
        state: dict[int, jax.Array] = {}
        done: deque[tuple[int, jax.Array]] = deque()
        results: list = [None] * num_batches

        def _retire_oldest() -> None:
            m, value = done.popleft()
            results[m] = jax.device_get(value)

        # 1F schedule: at tick t, microbatch m = t - s sits at stage s.
        # Submit deepest stage first so each tick's dispatches are
        # dependency-ordered without serializing across microbatches.
        for tick in range(num_batches + num_stages - 1):
            for s in reversed(range(num_stages)):
                m = tick - s
                if not (0 <= m < num_batches):
                    continue
                if s == 0:
                    # Admission: enforce the in-flight bound first.
                    while len(state) + len(done) >= max_in_flight:
                        if done:
                            _retire_oldest()
                        else:  # window smaller than pipeline depth:
                            # wait for the oldest in-flight activation.
                            oldest = min(state)
                            jax.block_until_ready(state[oldest])
                            break
                    value = microbatches[m]
                else:
                    value = state[m]
                value = jax.device_put(value, self._devices[s])
                value = self._stages[s](value)
                if force_sequential:
                    jax.block_until_ready(value)
                if s == num_stages - 1:
                    state.pop(m, None)
                    done.append((m, value))
                else:
                    state[m] = value
        while done:
            _retire_oldest()
        return results
