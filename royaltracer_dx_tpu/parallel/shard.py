"""Multi-chip data parallelism: pixel-sharded rendering over a device Mesh.

The reference is single-GPU (SURVEY.md section 2.3); its only parallel axis
is the per-pixel DispatchRays grid.  On TPU that axis becomes a 1-D
jax.sharding.Mesh: pixels (and their RNG lanes and framebuffer rows) shard
across chips, the scene + BVH + light table replicate, and the only
cross-chip traffic is the scalar camera-changed flag and whatever psum the
caller wants for global metrics — the render itself is embarrassingly
parallel, so collectives ride ICI only for reductions.

Spatial-reuse passes (ReSTIR pass 3) keep their neighbor taps intra-shard
by mirror-clamping at shard borders exactly like the reference clamps at
image borders (Common_v6.hlsl:223-236) — see restir shard notes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from royaltracer_dx_tpu.config import RenderConfig
from royaltracer_dx_tpu.render.megakernel import trace_paths_impl

try:  # jax>=0.6 stable API
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_exp

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_exp(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


PIXEL_AXIS = "pixels"


def pixel_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (PIXEL_AXIS,))


def pad_to_devices(n: int, n_devices: int) -> int:
    """Smallest N' >= n divisible by n_devices (pixel padding)."""
    return ((n + n_devices - 1) // n_devices) * n_devices


def make_sharded_trace(mesh: Mesh, cfg: RenderConfig):
    """jit(shard_map(trace_paths)) with scene replicated, rays sharded.

    Returns fn(scene_arrays, origins, dirs, seeds) -> (radiance [N,3],
    rays_traced [] — psummed across chips).
    """

    def local(scene, origins, dirs, seeds):
        radiance, rays = trace_paths_impl(scene, origins, dirs, seeds, cfg)
        return radiance, jax.lax.psum(rays, PIXEL_AXIS)

    sharded = shard_map(
        local,
        mesh,
        in_specs=(P(), P(PIXEL_AXIS), P(PIXEL_AXIS), P(PIXEL_AXIS)),
        out_specs=(P(PIXEL_AXIS), P()),
    )
    return jax.jit(sharded)


def shard_pixels(mesh: Mesh, *arrays):
    """Device_put arrays with their leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(PIXEL_AXIS))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Device_put a pytree fully replicated."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
