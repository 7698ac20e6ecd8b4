"""Ray/triangle intersection: batched Möller–Trumbore.

The brute-force closest-hit here replaces DXR TraceRay for small scenes and
is the ground-truth oracle for the BVH traversal kernels.  It is written as
dense [rays x tris] work — branch-free, tileable, exactly what the TPU VPU
wants — with a lax.scan over triangle chunks to bound memory.

TPU layout notes (why this file looks "scalarized"):
  * All inner math is PLANAR: x/y/z live in separate [N, C] arrays.  An
    [N, C, 3] layout puts 3 in the minor (lane) dimension and wastes
    125/128 VPU lanes; planar form runs the same math ~3x faster.
  * Chunks are padded up to >=128 triangles: a [N, 64] op costs exactly as
    much as [N, 128] (the VPU tile is 8x128 either way), so small chunks
    only waste lanes.
  * Winner selection is argmin + one-hot masked sums — never t[rows, idx]
    row gathers, which serialize on TPU (~7 ns/row).

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
from royaltracer_dx_tpu.utils import pvec as pv

INF = jnp.float32(1e30)
_DET_EPS = 1e-12
_MIN_CHUNK = 128  # one full lane tile


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


def _split3(a: jax.Array, axis: int):
    """Slice a length-3 axis into component planes."""
    return (
        jnp.take(a, 0, axis=axis),
        jnp.take(a, 1, axis=axis),
        jnp.take(a, 2, axis=axis),
    )


def _mt_chunk_planar(o, d, v0, e1, e2, t_min, t_max):
    """Möller–Trumbore for all rays x one chunk of triangles, planar form.

    o, d: tuples of 3 ray-component planes shaped [N, 1].
    v0, e1, e2: tuples of 3 triangle-component planes shaped [C].
    Returns (t [N, C], u [N, C], v [N, C]) with misses at INF.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    v0x, v0y, v0z = v0
    e1x, e1y, e1z = e1
    e2x, e2y, e2z = e2
    # p = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # q = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return jnp.where(ok, t, INF), u, v


def _chunk_planes(tri_verts: jax.Array, chunk: int):
    """Pad + split triangles into per-chunk planar component arrays.

    Returns (num_chunks, (v0, e1, e2)) where each component tuple holds
    three [num_chunks, chunk] planes.  Padded (degenerate zero-area)
    triangles never pass the det test.
    """
    t_count = tri_verts.shape[0]
    pad = (-t_count) % chunk
    tv = jnp.pad(tri_verts, ((0, pad), (0, 0), (0, 0)))
    num_chunks = tv.shape[0] // chunk

    def planes(a):  # [T, 3] -> three [num_chunks, chunk]
        return tuple(c.reshape(num_chunks, chunk) for c in _split3(a, 1))

    v0 = planes(tv[:, 0])
    e1 = planes(tv[:, 1] - tv[:, 0])
    e2 = planes(tv[:, 2] - tv[:, 0])
    return num_chunks, (v0, e1, e2)


def as_planes3(a):
    """Normalize a ray argument to three [N] component planes.

    Accepts either an [N, 3] AoS array (public API compatibility) or a
    3-tuple of planes.  The planar form is the fast path on TPU: a
    materialized [N, 3] f32 array is physically padded to 128 lanes
    (42x memory + relayout traffic) whenever it crosses a fusion
    boundary such as lax.map — the round-3 1080p flagship's chunked
    in-pass traces measured 76 vs 36.5 ns/ray from exactly that."""
    if isinstance(a, (tuple, list)):
        return tuple(a)
    return _split3(a, 1)


def _ray_planes(origins, dirs):
    o = tuple(c[:, None] for c in as_planes3(origins))
    d = tuple(c[:, None] for c in as_planes3(dirs))
    return o, d


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
      origins, dirs: [N, 3] AoS or 3-tuples of [N] planes (see as_planes3).
      tri_verts: [T, 3, 3].
      chunk: triangles per scan step (memory knob: N*chunk temporaries).
    """
    o, d = _ray_planes(origins, dirs)
    n = o[0].shape[0]
    t_count = tri_verts.shape[0]
    chunk = max(min(chunk, -(-t_count // _MIN_CHUNK) * _MIN_CHUNK), _MIN_CHUNK)
    num_chunks, tris_all = _chunk_planes(tri_verts, chunk)
    # t_min/t_max: scalar or per-ray [N] -> [N, 1] (broadcasts vs [N, C])
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))[:, None]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))[:, None]
    lane = jax.lax.iota(jnp.int32, chunk)[None, :]  # [1, C]

    def step(carry, tris):
        best_t, best_tri, best_u, best_v, base = carry
        v0, e1, e2 = tris
        t, u, v = _mt_chunk_planar(o, d, v0, e1, e2, t_min, t_max)
        t_c = jnp.min(t, axis=-1)                       # [N]
        idx = jnp.argmin(t, axis=-1).astype(jnp.int32)  # [N]
        hot = idx[:, None] == lane                      # [N, C] one-hot
        u_c = jnp.sum(jnp.where(hot, u, 0.0), axis=-1)
        v_c = jnp.sum(jnp.where(hot, v, 0.0), axis=-1)
        better = t_c < best_t
        carry = (
            jnp.where(better, t_c, best_t),
            jnp.where(better, base + idx, best_tri),
            jnp.where(better, u_c, best_u),
            jnp.where(better, v_c, best_v),
            base + chunk,
        )
        return carry, None

    # derive carry inits from the ray arrays so their sharding/varying axes
    # match the loop outputs under shard_map (constants would be unvarying)
    zero = o[0][:, 0] * 0.0
    init = (
        zero + INF,
        zero.astype(jnp.int32),
        zero,
        zero,
        jnp.int32(0),
    )
    if num_chunks == 1:
        (t, tri, u, v, _), _ = step(init, jax.tree.map(lambda a: a[0], tris_all))
    else:
        (t, tri, u, v, _), _ = jax.lax.scan(step, init, tris_all)
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
    o, d = _ray_planes(origins, dirs)
    n = o[0].shape[0]
    t_count = tri_verts.shape[0]
    chunk = max(min(chunk, -(-t_count // _MIN_CHUNK) * _MIN_CHUNK), _MIN_CHUNK)
    num_chunks, tris_all = _chunk_planes(tri_verts, chunk)
    t_min = jnp.broadcast_to(jnp.asarray(t_min), (n,))[:, None]
    t_max = jnp.broadcast_to(jnp.asarray(t_max), (n,))[:, None]

    def step(occluded, tris):
        v0, e1, e2 = tris
        t, _, _ = _mt_chunk_planar(o, d, v0, e1, e2, t_min, t_max)
        return occluded | jnp.any(t < INF, axis=-1), None

    no_hit = o[0][:, 0] * 0.0 > 1.0  # varying-axes-matching False init
    if num_chunks == 1:
        occluded, _ = step(no_hit, jax.tree.map(lambda a: a[0], tris_all))
    else:
        occluded, _ = jax.lax.scan(step, no_hit, tris_all)
    return occluded


def _shade_attrs_from_planes(v, nv, u_bary, v_bary):
    """Shared planar shading-attribute math (Hit_v6.hlsl:12-61 semantics).

    v / nv: 9 vertex / vertex-normal component planes (v0 v1 v2 × xyz);
    returns (normal, flat, area) planar."""
    w0 = 1.0 - u_bary - v_bary
    w1, w2 = u_bary, v_bary
    e1 = tuple(v[3 + c] - v[c] for c in range(3))
    e2 = tuple(v[6 + c] - v[c] for c in range(3))
    cr = pv.cross(e1, e2)
    area = 0.5 * pv.length(cr)
    flat = pv.normalize(cr)
    smooth = []
    for c in range(3):
        acc = 0.0
        for k, wk in enumerate((w0, w1, w2)):
            has_n = (
                (nv[3 * k] != 0.0) | (nv[3 * k + 1] != 0.0) | (nv[3 * k + 2] != 0.0)
            )
            acc = acc + wk * jnp.where(has_n, nv[3 * k + c], flat[c])
        smooth.append(acc)
    smooth = tuple(smooth)
    use_smooth = pv.length(smooth) > 1e-4
    normal = pv.where(use_smooth, pv.normalize(smooth), flat)
    return normal, flat, area


def hit_attributes_p(hit: Hit, tri_table: jax.Array):
    """All per-hit shading attributes from the packed triangle table in
    ONE wide row gather (see SceneArrays.with_tri_table — row-gather
    cost is per op, not per byte; profile_r5f).

    Returns (normal, flat, area, mid, obj) — normals planar, ids int32.
    """
    row = tri_table[hit.tri]                  # [N, 20] one wide gather
    v = [row[:, k] for k in range(9)]
    nv = [row[:, 9 + k] for k in range(9)]
    # ids travel as float values, not bitcasts (TPU flushes denormals)
    mid = row[:, 18].astype(jnp.int32)
    obj = row[:, 19].astype(jnp.int32)
    normal, flat, area = _shade_attrs_from_planes(v, nv, hit.u, hit.v)
    return normal, flat, area, mid, obj


def interpolate_hit_p(hit: Hit, tri_verts, tri_normals):
    """Planar ``interpolate_hit``: one [N, 9] row-gather per table, then
    pure full-lane component math.

    Returns (pos, normal, flat, area) with the vectors as planar tuples
    (see utils/pvec.py).  Same semantics as ``interpolate_hit`` minus the
    toward-ray flip (callers flip).
    """
    t_count = tri_verts.shape[0]
    tv9 = tri_verts.reshape(t_count, 9)[hit.tri]     # [N, 9] one gather
    tn9 = tri_normals.reshape(t_count, 9)[hit.tri]   # [N, 9] one gather
    v = [tv9[:, k] for k in range(9)]   # v0.xyz v1.xyz v2.xyz planes
    nv = [tn9[:, k] for k in range(9)]
    w0 = 1.0 - hit.u - hit.v
    w1, w2 = hit.u, hit.v
    pos = tuple(w0 * v[c] + w1 * v[3 + c] + w2 * v[6 + c] for c in range(3))
    normal, flat, area = _shade_attrs_from_planes(v, nv, hit.u, hit.v)
    return pos, normal, flat, area


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
