"""Multi-device (8 virtual CPU devices) sharding tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_data_parallel_train_step_matches_single_device():
    """DP train step over an 8-way mesh == single-device step (same math)."""
    from densematchingbenchmark_tpu.parallel import (make_mesh, shard_batch,
                                                     replicated)
    b, h, w = 8, 16, 16
    rng = np.random.RandomState(0)
    x = rng.rand(b, h, w, 4).astype(np.float32)

    def loss(params, x):
        y = jnp.einsum("bhwc,cd->bhwd", x, params)
        return jnp.mean(jnp.square(y - 1.0))

    params = rng.rand(4, 4).astype(np.float32)
    g_single = jax.grad(loss)(jnp.asarray(params), jnp.asarray(x))

    mesh = make_mesh((8, 1))
    xs = shard_batch(mesh, {"x": x})["x"]
    ps = jax.device_put(jnp.asarray(params), replicated(mesh))
    g_dp = jax.jit(jax.grad(loss))(ps, xs)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_single),
                               rtol=1e-5)


_ALL_DRYRUN_FAMILIES = (
    "PSMNet", "AnyNet", "DeepPruner-4x", "DeepPruner-8x", "AcfNet-adaptive",
    "GCNet", "StereoNet-2stage", "StereoNet-4stage", "PWCFlow", "RAFT")


@pytest.mark.parametrize("family", _ALL_DRYRUN_FAMILIES)
def test_dryrun_multichip(family):
    # per-family so xdist spreads the 10 compiles across workers (the
    # monolithic form ran ~15 min on one worker); the driver still calls
    # dryrun_multichip(n) with only=None = every family in one process
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8, only={family})


def test_cost_volume_sharding_constraint_compiles():
    """D-sharded volume path: constraint + 3D conv compiles on (2, 4) mesh."""
    from densematchingbenchmark_tpu.parallel import make_mesh
    from densematchingbenchmark_tpu.parallel.mesh import cost_volume_sharding
    from jax import lax

    mesh = make_mesh((2, 4))
    sh = cost_volume_sharding(mesh)
    vol = np.random.RandomState(0).rand(2, 8, 8, 8, 4).astype(np.float32)
    kernel = np.random.RandomState(1).rand(3, 3, 3, 4, 4).astype(np.float32)

    @jax.jit
    def f(v, k):
        v = jax.lax.with_sharding_constraint(v, sh)
        return lax.conv_general_dilated(
            v, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    out = f(jnp.asarray(vol), jnp.asarray(kernel))
    assert np.isfinite(np.asarray(out)).all()
