"""Multi-device pixel sharding on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from royaltracer_dx_tpu.parallel.shard import (
    make_sharded_trace,
    pad_to_devices,
    pixel_mesh,
    replicate,
    shard_pixels,
)


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_pad_to_devices():
    assert pad_to_devices(100, 8) == 104
    assert pad_to_devices(104, 8) == 104


@pytest.fixture(scope="module")
def setup():
    import __graft_entry__ as ge

    return ge._small_setup(width=64, height=8, bounces=2)


def test_sharded_matches_single_device(setup):
    cfg, scene, origins, dirs, seeds = setup
    from royaltracer_dx_tpu.render.megakernel import trace_paths_impl

    single, rays_single = jax.jit(
        lambda o, d, s: trace_paths_impl(scene, o, d, s, cfg)
    )(origins, dirs, seeds)

    mesh = pixel_mesh()
    scene_r = replicate(mesh, scene)
    o_s, d_s, s_s = shard_pixels(mesh, origins, dirs, seeds)
    step = make_sharded_trace(mesh, cfg)
    sharded, rays_sharded = step(scene_r, o_s, d_s, s_s)

    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=1e-5, atol=1e-6
    )
    assert np.isclose(float(rays_single), float(rays_sharded))


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
