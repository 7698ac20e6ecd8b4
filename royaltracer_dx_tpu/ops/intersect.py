"""Ray/triangle intersection: batched Möller–Trumbore.

The brute-force closest-hit here replaces DXR TraceRay for small scenes and
is the ground-truth oracle for the BVH traversal kernels.  It is written as
dense [rays x tris] work — branch-free, tileable, exactly what the TPU VPU
wants — with a lax.scan over triangle chunks to bound memory.

Replaces: hardware TraceRay dispatch (RayGen_v6_pass1.hlsl:99) + the
closest-hit payload fill (Hit_v6.hlsl:12-61).  Triangles are double-sided
(the reference traces RAY_FLAG_NONE with no cull flags).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.utils import math3d as m3

INF = jnp.float32(1e30)
_DET_EPS = 1e-12


@flax.struct.dataclass
class Hit:
    """Closest-hit record (HitInfo analog, Common_v6.hlsl:35-46)."""

    t: jax.Array        # [N] hit distance; >= INF means miss
    tri: jax.Array      # [N] int32 triangle index (valid only if hit)
    u: jax.Array        # [N] barycentric of v1
    v: jax.Array        # [N] barycentric of v2

    @property
    def valid(self) -> jax.Array:
        return self.t < INF


def _mt_chunk(origins, dirs, v0, e1, e2, t_min, t_max):
    """Möller–Trumbore for all rays x one chunk of triangles.

    origins/dirs: [N, 3]; v0/e1/e2: [C, 3].
    Returns (t [N, C], u [N, C], v [N, C]) with misses at INF.
    """
    p = jnp.cross(dirs[:, None, :], e2[None, :, :])          # [N, C, 3]
    det = jnp.sum(e1[None, :, :] * p, axis=-1)               # [N, C]
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tvec = origins[:, None, :] - v0[None, :, :]              # [N, C, 3]
    u = jnp.sum(tvec * p, axis=-1) * inv_det
    q = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(dirs[:, None, :] * q, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * q, axis=-1) * inv_det
    ok = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return jnp.where(ok, t, INF), u, v


@functools.partial(jax.jit, static_argnames=("chunk",))
def closest_hit_brute(
    origins: jax.Array,
    dirs: jax.Array,
    tri_verts: jax.Array,
    t_min: float | jax.Array = 1e-4,
    t_max: float | jax.Array = 1e4,
    chunk: int = 512,
) -> Hit:
    """Closest hit of each ray against all triangles.

    Args:
      origins, dirs: [N, 3].
      tri_verts: [T, 3, 3].
      chunk: triangles per scan step (memory knob: N*chunk temporaries).
    """
    n = origins.shape[0]
    t_count = tri_verts.shape[0]
    while chunk // 2 >= t_count and chunk > 8:
        chunk //= 2  # don't pad tiny scenes up to a huge chunk
    pad = (-t_count) % chunk
    tv = jnp.pad(tri_verts, ((0, pad), (0, 0), (0, 0)))
    v0 = tv[:, 0]
    e1 = tv[:, 1] - tv[:, 0]
    e2 = tv[:, 2] - tv[:, 0]
    num_chunks = tv.shape[0] // chunk
    v0c = v0.reshape(num_chunks, chunk, 3)
    e1c = e1.reshape(num_chunks, chunk, 3)
    e2c = e2.reshape(num_chunks, chunk, 3)
    # padded (degenerate zero-area) triangles never pass the det test

    def step(carry, tris):
        best_t, best_tri, best_u, best_v, base = carry
        cv0, ce1, ce2 = tris
        t, u, v = _mt_chunk(origins, dirs, cv0, ce1, ce2, t_min, t_max)
        idx = jnp.argmin(t, axis=-1)
        rows = jnp.arange(n)
        t_c = t[rows, idx]
        better = t_c < best_t
        carry = (
            jnp.where(better, t_c, best_t),
            jnp.where(better, base + idx.astype(jnp.int32), best_tri),
            jnp.where(better, u[rows, idx], best_u),
            jnp.where(better, v[rows, idx], best_v),
            base + chunk,
        )
        return carry, None

    # derive carry inits from the ray arrays so their sharding/varying axes
    # match the loop outputs under shard_map (constants would be unvarying)
    zero = origins[:, 0] * 0.0
    init = (
        zero + INF,
        zero.astype(jnp.int32),
        zero,
        zero,
        jnp.int32(0),
    )
    (t, tri, u, v, _), _ = jax.lax.scan(step, init, (v0c, e1c, e2c))
    return Hit(t=t, tri=tri, u=u, v=v)


@functools.partial(jax.jit, static_argnames=("chunk",))
def any_hit_brute(
    origins: jax.Array,
    dirs: jax.Array,
    tri_verts: jax.Array,
    t_min: jax.Array,
    t_max: jax.Array,
    chunk: int = 512,
) -> jax.Array:
    """Boolean occlusion query (ShadowRay.hlsl semantics).

    t_min/t_max may be per-ray [N] arrays.  Returns occluded [N] bool.
    """
    n = origins.shape[0]
    t_count = tri_verts.shape[0]
    while chunk // 2 >= t_count and chunk > 8:
        chunk //= 2
    pad = (-t_count) % chunk
    tv = jnp.pad(tri_verts, ((0, pad), (0, 0), (0, 0)))
    v0c = tv[:, 0].reshape(-1, chunk, 3)
    e1c = (tv[:, 1] - tv[:, 0]).reshape(-1, chunk, 3)
    e2c = (tv[:, 2] - tv[:, 0]).reshape(-1, chunk, 3)
    t_min = jnp.broadcast_to(jnp.asarray(t_min), (n,))[:, None]
    t_max = jnp.broadcast_to(jnp.asarray(t_max), (n,))[:, None]

    def step(occluded, tris):
        cv0, ce1, ce2 = tris
        t, _, _ = _mt_chunk(origins, dirs, cv0, ce1, ce2, t_min, t_max)
        return occluded | jnp.any(t < INF, axis=-1), None

    no_hit = origins[:, 0] * 0.0 > 1.0  # varying-axes-matching False init
    occluded, _ = jax.lax.scan(step, no_hit, (v0c, e1c, e2c))
    return occluded


def interpolate_hit(hit: Hit, tri_verts, tri_normals, dirs):
    """Shading attributes at the hit (Hit_v6.hlsl:12-61 semantics).

    Returns (position [N,3], shading_normal [N,3], flat_normal [N,3],
    area [N]).  Vertex normals of zero fall back to the flat normal per
    vertex; the final smooth normal falls back to flat if near-zero; both
    normals are flipped toward the incoming ray (v5 Hit.hlsl:108-111 —
    the v6 closest-hit does NOT flip; callers choose via flip_toward_ray).
    """
    tv = tri_verts[hit.tri]      # [N, 3, 3]
    tn = tri_normals[hit.tri]    # [N, 3, 3]
    w = 1.0 - hit.u - hit.v
    bary = jnp.stack([w, hit.u, hit.v], axis=-1)  # [N, 3]
    pos = jnp.sum(tv * bary[..., None], axis=1)
    e1 = tv[:, 1] - tv[:, 0]
    e2 = tv[:, 2] - tv[:, 0]
    cr = jnp.cross(e1, e2)
    area = 0.5 * m3.length(cr)
    flat = m3.normalize(cr)
    has_n = jnp.any(tn != 0.0, axis=-1)          # [N, 3]
    per_vertex = jnp.where(has_n[..., None], tn, flat[:, None, :])
    smooth = jnp.sum(per_vertex * bary[..., None], axis=1)
    use_smooth = m3.length(smooth) > 1e-4
    normal = jnp.where(use_smooth[..., None], m3.normalize(smooth), flat)
    return pos, normal, flat, area
