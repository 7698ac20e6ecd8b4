"""Emissive-triangle sampling shared by the megakernel and ReSTIR passes.

Replaces the HLSL CDF binary search + barycentric point generation
(Sampler_v6.hlsl:292-345, Hit.hlsl:196-258) with a vectorized searchsorted
gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.config import EPSILON
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


# ----------------------- planar (gather-free) path -----------------------

# Above this light count, the one-hot select loop loses to a row gather.
ONEHOT_LIGHT_MAX = 40


def light_tables(lights: LightTriangles, object_to_world: jax.Array) -> list:
    """World-space light record columns, computed once per pass ([L] work).

    Returns 16 [L] columns: verts (9), unit normal (3), pdf = weight/area
    (1), emission (3) — the per-light quantities SampleLightNEE derives per
    candidate (Sampler_v6.hlsl:292-345)."""
    from royaltracer_dx_tpu.utils import math3d as m3

    l_count = lights.count
    wv = light_world_verts(
        lights, object_to_world, jnp.arange(l_count, dtype=jnp.int32)
    )  # [L, 3, 3]
    e1 = wv[:, 1] - wv[:, 0]
    e2 = wv[:, 2] - wv[:, 0]
    cr = jnp.cross(e1, e2)
    area = jnp.abs(0.5 * m3.length(cr))
    nl = m3.normalize(cr)
    pdf = lights.weight / jnp.maximum(area, EPSILON)
    cols = [wv[:, k, c] for k in range(3) for c in range(3)]
    cols += [nl[:, 0], nl[:, 1], nl[:, 2], pdf,
             lights.emission[:, 0], lights.emission[:, 1], lights.emission[:, 2]]
    return cols


def select_light_records(cols: list, cdf: jax.Array, u_sel: jax.Array) -> list:
    """CDF-pick a light per candidate and return its record planes.

    u_sel: any shape (typically candidate-major [M, N]).  The binary search
    (Sampler_v6.hlsl:295-311) becomes a dense compare-count; record fields
    come from a one-hot select loop for small tables (no row gathers) or a
    packed single gather for big ones."""
    l_count = cdf.shape[0]
    idx = jnp.zeros(u_sel.shape, jnp.int32)
    for l in range(l_count - 1):  # count of cdf[l] <= u, clipped to L-1
        idx = idx + (cdf[l] <= u_sel).astype(jnp.int32)

    if l_count <= ONEHOT_LIGHT_MAX:
        out = []
        for col in cols:
            acc = jnp.full(u_sel.shape, col[0], col.dtype)
            for l in range(1, l_count):
                acc = jnp.where(idx == l, col[l], acc)
            out.append(acc)
        return out
    packed = jnp.stack(cols, axis=1)          # [L, 16]
    rows = packed[idx.reshape(-1)]            # [prod, 16]
    return [rows[:, k].reshape(u_sel.shape) for k in range(len(cols))]
