"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from astrophotography_tpu.parallel import (
    frame_space_mesh,
    halo_exchange_rows,
    replicate,
    shard_frames,
    shard_spatial,
    sharded_map_overlap,
)


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return devs


def test_mesh_construction(devices):
    mesh = frame_space_mesh(devices=devices[:8])
    assert mesh.devices.shape == (8, 1)
    mesh2 = frame_space_mesh(n_frame=2, devices=devices[:8])
    assert mesh2.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        frame_space_mesh(n_frame=3, n_space=2, devices=devices[:8])


def test_sharded_stack_combine_matches_single_device(devices):
    """Sigma-clip combine over a frame-sharded stack == unsharded result;
    XLA inserts the cross-device reduction."""
    from astrophotography_tpu.ops.stack import sigma_clip_combine

    mesh = frame_space_mesh(n_frame=8, devices=devices[:8])
    rng = np.random.default_rng(0)
    stack = rng.normal(100, 5, (16, 64, 64)).astype(np.float32)
    stack[3, 10, 10] = 50000.0

    ref = np.asarray(sigma_clip_combine(jnp.asarray(stack)))

    sharded = jax.device_put(stack, shard_frames(mesh))
    with mesh:
        combined = jax.jit(
            lambda s: sigma_clip_combine(s),
            out_shardings=shard_spatial(mesh))(sharded)
    np.testing.assert_allclose(np.asarray(combined), ref, rtol=1e-5,
                               atol=1e-3)


def test_halo_exchange_stencil_identical_to_unsharded(devices):
    """A 5x5 mean stencil over row-sharded data with halo exchange must
    equal the unsharded computation."""
    mesh = frame_space_mesh(n_frame=1, n_space=8, devices=devices[:8])
    rng = np.random.default_rng(1)
    img = rng.normal(size=(128, 64)).astype(np.float32)

    def stencil(x):
        # 5x5 box mean with zero padding
        h, w = x.shape
        p = jnp.pad(x, 2)
        acc = jnp.zeros_like(x)
        for dy in range(5):
            for dx in range(5):
                acc = acc + p[dy:dy + h, dx:dx + w]
        return acc / 25.0

    ref = np.asarray(stencil(jnp.asarray(img)))
    lifted = sharded_map_overlap(stencil, mesh, halo=2)
    with mesh:
        out = lifted(jax.device_put(img, shard_spatial(mesh)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-5)


def test_sharded_calibrate_batch(devices):
    """Frame-sharded calibration: purely local, no collectives needed."""
    from astrophotography_tpu.ops.calibrate import calibrate_batch

    mesh = frame_space_mesh(n_frame=8, devices=devices[:8])
    rng = np.random.default_rng(2)
    frames = rng.normal(1000, 10, (8, 32, 32)).astype(np.float32)
    bias = rng.normal(300, 2, (32, 32)).astype(np.float32)
    ref = np.asarray(calibrate_batch(jnp.asarray(frames), jnp.asarray(bias)))
    with mesh:
        out = jax.jit(calibrate_batch)(
            jax.device_put(frames, shard_frames(mesh)),
            jax.device_put(bias, replicate(mesh)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
    # output keeps the frame sharding (no resharding inserted)
    assert len(out.sharding.device_set) == 8
