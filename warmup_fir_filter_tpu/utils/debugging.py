"""Numerical-safety / determinism checks (SURVEY.md §5.2 equivalents).

The reference has no sanitizers; the C++ side here gets ASan/UBSan via
the ``sanitize`` CMake preset, and the JAX side gets:

- :func:`nan_guard` — context manager enabling jax's debug_nans so any
  NaN/Inf produced inside jitted code raises at the producing op;
- :func:`assert_deterministic` — executes a function twice and asserts
  bit-identical outputs (the determinism check appropriate for a
  framework whose contract *is* bit-exactness).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import numpy as np


@contextmanager
def nan_guard(enabled: bool = True):
    """Raise on NaN/Inf production inside traced code within the scope."""
    if not enabled:
        yield
        return
    previous = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", previous)


def assert_deterministic(fn, *args, runs: int = 2) -> None:
    """Assert that repeated executions produce bit-identical outputs."""
    reference = jax.tree.map(np.asarray, fn(*args))
    for _ in range(runs - 1):
        again = jax.tree.map(np.asarray, fn(*args))
        leaves_ref = jax.tree.leaves(reference)
        leaves_new = jax.tree.leaves(again)
        for ref, new in zip(leaves_ref, leaves_new):
            if not np.array_equal(ref, new):
                raise AssertionError(
                    "Non-deterministic execution detected: outputs differ "
                    "between runs."
                )
