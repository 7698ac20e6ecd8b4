"""Emissive-triangle sampling shared by the megakernel and ReSTIR passes.

Replaces the HLSL CDF binary search + barycentric point generation
(Sampler_v6.hlsl:292-345, Hit.hlsl:196-258) with a vectorized searchsorted
gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.scene.types import LightTriangles


def select_light(lights: LightTriangles, u: jax.Array) -> jax.Array:
    """First index with u < cdf[i] — identical to the HLSL binary search."""
    idx = jnp.searchsorted(lights.cdf, u, side="right")
    return jnp.clip(idx, 0, lights.count - 1).astype(jnp.int32)


def light_world_verts(
    lights: LightTriangles, object_to_world: jax.Array, idx: jax.Array
) -> jax.Array:
    """World-space vertices of light ``idx`` under the current instance
    transforms.  Returns [..., 3, 3]."""
    verts = lights.verts[idx]                     # [..., 3, 3]
    m = object_to_world[lights.instance[idx]]     # [..., 4, 4]
    rot = m[..., None, :3, :3]                    # [..., 1, 3, 3]
    trn = m[..., None, :3, 3]
    # explicit mul/add keeps this tiny transform on the VPU in full fp32
    # (an einsum would hit the MXU and round in bf16 by default)
    return jnp.sum(rot * verts[..., None, :], axis=-1) + trn


def fold_barycentric(xi1: jax.Array, xi2: jax.Array):
    """Uniform triangle barycentrics via the fold trick (Hit.hlsl:233-241).
    Returns (u, v, w) with point = u*x + v*y + w*z."""
    flip = xi1 + xi2 > 1.0
    xi1 = jnp.where(flip, 1.0 - xi1, xi1)
    xi2 = jnp.where(flip, 1.0 - xi2, xi2)
    return 1.0 - xi1 - xi2, xi1, xi2
