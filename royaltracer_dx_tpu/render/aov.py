"""AOV / debug channel rendering.

The reference allocates a 30-layer output array cycled with the 'C' key for
debug visualization (Renderer.cpp:1148, :690-698) though its v6 shaders only
write layer 0.  This module realizes that intent: named channels derived
from the primary hit, each returned as an [H, W, C] array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.camera import generate_rays
from royaltracer_dx_tpu.config import RenderConfig
from royaltracer_dx_tpu.ops import restir
from royaltracer_dx_tpu.utils import math3d as m3

CHANNELS = (
    "albedo", "normal", "depth", "position", "material_id", "instance_id",
    "emission", "roughness", "metallic",
)


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_aovs(scene, cam: dict, cfg: RenderConfig) -> dict:
    """Primary-hit AOV dict; every value is [N, ...] flat row-major."""
    origins, dirs = generate_rays(cam, cfg.width, cfg.height, None)
    dirs = m3.normalize(dirs)
    hit = restir.trace_closest(scene, origins, dirs, cfg)
    mat = restir.fetch_material(scene, hit["mid"])
    v = hit["valid"]
    v3 = v[:, None]
    return dict(
        albedo=jnp.where(v3, mat["kd"][:, :3], 0.0),
        normal=jnp.where(v3, hit["normal"] * 0.5 + 0.5, 0.0),
        depth=jnp.where(v, m3.length(hit["pos"] - origins), 0.0),
        position=jnp.where(v3, hit["pos"], 0.0),
        material_id=jnp.where(v, hit["mid"], -1),
        instance_id=jnp.where(v, hit["obj"], -1),
        emission=jnp.where(v3, mat["ke"], 0.0),
        roughness=jnp.where(v, mat["rough"], 0.0),
        metallic=jnp.where(v, mat["metal"], 0.0),
    )
