"""MXU ray/triangle intersection: Möller–Trumbore as ONE matmul.

The small-scene TraceRay replacement (RayGen_v6_pass1.hlsl:99 at the
reference's own 2.2k-triangle flagship scene).  The VPU brute sweep
(ops/intersect.py) costs ~0.29 us/ray at 2k triangles — it is the VPU's
~10 G MT-tests/s ceiling.  The MXU runs 1-2 orders of magnitude more
flops; this module routes the whole ray x tri test matrix onto it.

Key identity: every Möller–Trumbore decision value is a scalar triple
product, hence BILINEAR in (ray features) x (triangle features):

    det   = e1.(d x e2)            = -d.n                 (n = e1 x e2)
    u*det = (o-v0).(d x e2)        = (o x d).e2 - d.(e2 x v0)
    v*det = d.((o-v0) x e1)        = -(o x d).e1 - d.(v0 x e1)
    t*det = e2.((o-v0) x e1)       = o.n - v0.n

With the per-ray feature vector  f = [d, o x d, o, 1]  (10 wide) and a
precomputed per-triangle [10, 4] coefficient block, ALL FOUR values for
every (ray, triangle) pair come out of one [R, 10] @ [10, 4T] matmul.
The hit decision is then a handful of VPU ops in the *products* domain
(u >= 0  <=>  (u*det)*det >= 0, etc.) — no per-pair cross products, one
divide for t.  Exactly double-sided, same eps semantics as the brute
path (RAY_FLAG_NONE parity), but NOT bit-identical to it: the matmul
accumulates dot products in a different order than the planar MT chain,
so winners can differ on sub-ulp near-ties.  Parity tests bound t/u/v
relative error and hit-id agreement instead of bitwise equality.

Numerics: features are formed about the scene centroid (origins and v0
re-centered) so the o.n - v0.n cancellation happens in well-scaled
coordinates; the matmul runs at HIGHEST precision (f32-equivalent
bf16x6 passes on the MXU).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.ops.intersect import INF, Hit, _DET_EPS

_LANE = 128          # tri-axis padding so plane slices stay tile-aligned
_RAY_CHUNK = 4096    # rays per scan step (bounds the [R, 4T] temporary)


@flax.struct.dataclass
class MxuTris:
    """Precomputed triangle coefficient matrix for the matmul MT.

    coeff is [10, 4*Tp] with the four decision planes blocked along
    lanes: columns [0:Tp) = det, [Tp:2Tp) = u*det, [2Tp:3Tp) = v*det,
    [3Tp:4Tp) = t*det.  Padded triangles are all-zero -> det = 0 ->
    never pass the |det| > eps test.  ``center`` is the re-centering
    offset applied to ray origins at trace time.
    """

    coeff: jax.Array    # [10, 4*Tp] f32
    center: jax.Array   # [3] f32
    num_tris: int = flax.struct.field(pytree_node=False)

    @property
    def padded(self) -> int:
        return self.coeff.shape[1] // 4


@jax.jit
def _build_coeff(tri_verts: jax.Array, center: jax.Array) -> jax.Array:
    t = tri_verts.shape[0]
    tp = -(-t // _LANE) * _LANE
    tv = jnp.pad(tri_verts, ((0, tp - t), (0, 0), (0, 0)))
    v0 = tv[:, 0] - center[None, :]
    e1 = tv[:, 1] - tv[:, 0]
    e2 = tv[:, 2] - tv[:, 0]
    n = jnp.cross(e1, e2)
    e2xv0 = jnp.cross(e2, v0)
    v0xe1 = jnp.cross(v0, e1)
    z = jnp.zeros((tp, 3), jnp.float32)
    zs = jnp.zeros((tp,), jnp.float32)
    # rows: d(3), oxd(3), o(3), 1   (o re-centered at trace time)
    det_col = jnp.concatenate([-n, z, z, zs[:, None]], axis=1)        # [Tp,10]
    a_col = jnp.concatenate([-e2xv0, e2, z, zs[:, None]], axis=1)
    b_col = jnp.concatenate([-v0xe1, -e1, z, zs[:, None]], axis=1)
    c_col = jnp.concatenate([z, z, n, -jnp.sum(v0 * n, axis=1, keepdims=True)],
                            axis=1)
    return jnp.concatenate(
        [det_col.T, a_col.T, b_col.T, c_col.T], axis=1)               # [10,4Tp]


def build_mxu_tris(tri_verts: jax.Array) -> MxuTris:
    """Precompute (or refit — same cost, O(T) device work) the coefficient
    matrix.  Centering uses the triangle AABB midpoint."""
    lo = jnp.min(tri_verts.reshape(-1, 3), axis=0)
    hi = jnp.max(tri_verts.reshape(-1, 3), axis=0)
    center = 0.5 * (lo + hi)
    return MxuTris(coeff=_build_coeff(tri_verts, center), center=center,
                   num_tris=int(tri_verts.shape[0]))


def _products(origins, dirs, coeff, center):
    """The one matmul: [R, 10] ray features @ [10, 4Tp] -> det/a/b/c."""
    o = origins - center[None, :]
    oxd = jnp.cross(o, dirs)
    one = jnp.ones((origins.shape[0], 1), jnp.float32)
    f = jnp.concatenate([dirs, oxd, o, one], axis=1)                  # [R,10]
    prod = jnp.dot(f, coeff, precision=jax.lax.Precision.HIGHEST)
    tp = coeff.shape[1] // 4
    return (prod[:, 0:tp], prod[:, tp:2 * tp],
            prod[:, 2 * tp:3 * tp], prod[:, 3 * tp:4 * tp])


def _decide(det, a, b, c, t_min, t_max):
    """Hit test in the products domain + t.  t_min/t_max: [R, 1]."""
    dok = jnp.abs(det) > _DET_EPS
    # u >= 0, v >= 0, u+v <= 1, t in (t_min, t_max) — all scaled by det^2>0
    ok = (dok
          & (a * det >= 0.0)
          & (b * det >= 0.0)
          & ((a + b - det) * det <= 0.0)
          & ((c - t_min * det) * det > 0.0)
          & ((c - t_max * det) * det < 0.0))
    t = jnp.where(ok, c / jnp.where(dok, det, 1.0), INF)
    return ok, t


@functools.partial(jax.jit, static_argnames=())
def _closest_chunk(origins, dirs, t_min, t_max, coeff, center):
    det, a, b, c = _products(origins, dirs, coeff, center)
    ok, t = _decide(det, a, b, c, t_min[:, None], t_max[:, None])
    idx = jnp.argmin(t, axis=-1).astype(jnp.int32)
    lane = jax.lax.iota(jnp.int32, t.shape[1])[None, :]
    hot = idx[:, None] == lane
    t_c = jnp.min(t, axis=-1)
    inv = jnp.sum(jnp.where(hot, 1.0 / jnp.where(jnp.abs(det) > _DET_EPS,
                                                 det, 1.0), 0.0), axis=-1)
    u_c = jnp.sum(jnp.where(hot, a, 0.0), axis=-1) * inv
    v_c = jnp.sum(jnp.where(hot, b, 0.0), axis=-1) * inv
    return t_c, idx, u_c, v_c


def closest_hit_mxu(origins, dirs, tris: MxuTris,
                    t_min=1e-4, t_max=1e4) -> Hit:
    """Closest hit of each ray against all triangles via the MXU matmul."""
    n = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if n <= _RAY_CHUNK:
        t, tri, u, v = _closest_chunk(origins, dirs, t_min, t_max,
                                      tris.coeff, tris.center)
        return Hit(t=t, tri=tri, u=u, v=v)
    pad = (-n) % _RAY_CHUNK
    chunks = (n + pad) // _RAY_CHUNK

    def rs(x, fill=0.0):
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                    constant_values=fill)
        return x.reshape((chunks, _RAY_CHUNK) + x.shape[1:])

    def step(_, xs):
        o, d, lo, hi = xs
        return None, _closest_chunk(o, d, lo, hi, tris.coeff, tris.center)

    _, (t, tri, u, v) = jax.lax.scan(
        step, None, (rs(origins), rs(dirs, 1.0), rs(t_min), rs(t_max, -1.0)))
    out = [x.reshape(-1)[:n] for x in (t, tri, u, v)]
    return Hit(t=out[0], tri=out[1].astype(jnp.int32), u=out[2], v=out[3])


@functools.partial(jax.jit, static_argnames=())
def _anyhit_chunk(origins, dirs, t_min, t_max, coeff, center):
    det, a, b, c = _products(origins, dirs, coeff, center)
    ok, _ = _decide(det, a, b, c, t_min[:, None], t_max[:, None])
    return jnp.any(ok, axis=-1)


def any_hit_mxu(origins, dirs, tris: MxuTris, t_min, t_max) -> jax.Array:
    """Occlusion query (ShadowRay.hlsl semantics) via the MXU matmul.
    No divides at all — every test stays in the products domain."""
    n = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if n <= _RAY_CHUNK:
        return _anyhit_chunk(origins, dirs, t_min, t_max,
                             tris.coeff, tris.center)
    pad = (-n) % _RAY_CHUNK
    chunks = (n + pad) // _RAY_CHUNK

    def rs(x, fill=0.0):
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                    constant_values=fill)
        return x.reshape((chunks, _RAY_CHUNK) + x.shape[1:])

    def step(_, xs):
        o, d, lo, hi = xs
        return None, _anyhit_chunk(o, d, lo, hi, tris.coeff, tris.center)

    _, occ = jax.lax.scan(
        step, None, (rs(origins), rs(dirs, 1.0), rs(t_min), rs(t_max, -1.0)))
    return occ.reshape(-1)[:n]
