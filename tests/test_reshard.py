"""Channel↔time all_to_all resharding tests on the virtual mesh."""

import jax
import numpy as np
import pytest

from warmup_fir_filter_tpu.parallel import make_mesh
from warmup_fir_filter_tpu.parallel.reshard import (
    channel_to_time,
    time_to_channel,
)


@pytest.fixture
def mesh4(require_devices):
    return make_mesh({"data": 4}, devices=require_devices(4))


def test_roundtrip_identity(rng, mesh4):
    x = rng.integers(0, 256, size=(8, 64), dtype=np.uint8)
    flipped = channel_to_time(x, mesh=mesh4)
    back = time_to_channel(np.asarray(flipped), mesh=mesh4)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_values_preserved(rng, mesh4):
    x = np.arange(16 * 32, dtype=np.int32).reshape(16, 32)
    flipped = np.asarray(channel_to_time(x, mesh=mesh4))
    np.testing.assert_array_equal(flipped, x)  # global value unchanged


def test_sharding_layout_flips(rng, mesh4):
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = rng.normal(size=(8, 64)).astype(np.float32)
    flipped = channel_to_time(x, mesh=mesh4)
    assert flipped.sharding.is_equivalent_to(
        NamedSharding(mesh4, P(None, "data")), ndim=2
    )
    back = time_to_channel(flipped, mesh=mesh4)
    assert back.sharding.is_equivalent_to(
        NamedSharding(mesh4, P("data", None)), ndim=2
    )


def test_indivisible_rejected(mesh4):
    with pytest.raises(ValueError, match="divide"):
        channel_to_time(np.zeros((6, 64)), mesh=mesh4)
    with pytest.raises(ValueError, match="divide"):
        time_to_channel(np.zeros((8, 63)), mesh=mesh4)
