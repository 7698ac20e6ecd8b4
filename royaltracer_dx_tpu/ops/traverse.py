"""Stackless BVH traversal: DFS skip-links, batched over ray lanes.

Replaces DXR hardware TraceRay (fixed-function BVH walk) with a
TPU-shaped loop: every ray carries ONE int32 cursor into the tree's
precomputed DFS order (hit_link descends, skip_link jumps the subtree).
Each while-loop step is a gather (node AABB), a slab test, an optional
leaf Möller–Trumbore over ``leaf_size`` triangles, and a cursor update —
no per-lane stack, no data-dependent shapes, pure VPU math + gathers.
Lanes run lock-step (masked) until all cursors hit the sentinel 0;
closest-hit culls nodes whose entry distance exceeds the current best t.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.ops.bvh import LBVH
from royaltracer_dx_tpu.ops.intersect import Hit, INF


def _slab_test(amin, amax, origin, inv_dir, t_min, t_max):
    """Ray/AABB slab test.  Returns (hit, t_enter)."""
    t0 = (amin - origin) * inv_dir
    t1 = (amax - origin) * inv_dir
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    t_enter = jnp.maximum(jnp.max(lo, axis=-1), t_min)
    t_exit = jnp.minimum(jnp.min(hi, axis=-1), t_max)
    return t_enter <= t_exit, t_enter


def _leaf_intersect(leaf_idx, origins, dirs, sorted_tris, leaf_size, t_min, t_max):
    """MT test of each lane's current leaf triangles.

    leaf_idx: [N] leaf ordinal (node - P).  Returns (t [N, L], u, v) with
    misses at INF.
    """
    base = leaf_idx * leaf_size
    tri_ids = base[:, None] + jnp.arange(leaf_size)[None, :]      # [N, L]
    tv = sorted_tris[tri_ids]                                     # [N, L, 3, 3]
    v0 = tv[..., 0, :]
    e1 = tv[..., 1, :] - v0
    e2 = tv[..., 2, :] - v0
    d = dirs[:, None, :]
    o = origins[:, None, :]
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * p, axis=-1) * inv_det
    q = jnp.cross(tvec, e1)
    v = jnp.sum(d * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min[:, None]) & (t < t_max[:, None])
    )
    return jnp.where(ok, t, INF), u, v, tri_ids


@functools.partial(jax.jit, static_argnames=("max_steps",))
def closest_hit_bvh(
    origins: jax.Array,
    dirs: jax.Array,
    bvh: LBVH,
    t_min: float | jax.Array = 1e-4,
    t_max: float | jax.Array = 1e4,
    max_steps: int = 0,
) -> Hit:
    """Closest hit via skip-link traversal.  Returns Hit with ORIGINAL
    triangle ids (via bvh.perm)."""
    n = origins.shape[0]
    p = bvh.num_leaves
    leaf_size = bvh.leaf_size
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    inv_dir = jnp.where(jnp.abs(dirs) > 1e-20, 1.0 / dirs, jnp.sign(dirs) * 1e20 + 1e20)

    state = dict(
        node=jnp.ones((n,), jnp.int32),
        t_best=t_max0,
        tri=jnp.full((n,), -1, jnp.int32),
        u=jnp.zeros((n,)),
        v=jnp.zeros((n,)),
    )

    def cond(st):
        return jnp.any(st["node"] > 0)

    def step(st):
        node = jnp.maximum(st["node"], 1)        # keep gathers in-range
        active = st["node"] > 0
        amin = bvh.aabb_min[node]
        amax = bvh.aabb_max[node]
        box_hit, _ = _slab_test(amin, amax, origins, inv_dir, t_min, st["t_best"])
        box_hit = box_hit & active
        is_leaf = node >= p

        # leaf intersection (masked)
        leaf_idx = jnp.where(is_leaf & box_hit, node - p, 0)
        t, u, v, tri_ids = _leaf_intersect(
            leaf_idx, origins, dirs, bvh.sorted_tris, leaf_size, t_min, st["t_best"]
        )
        t = jnp.where((is_leaf & box_hit)[:, None], t, INF)
        best_l = jnp.argmin(t, axis=-1)
        rows = jnp.arange(n)
        t_c = t[rows, best_l]
        better = t_c < st["t_best"]

        st_tri = jnp.where(better, tri_ids[rows, best_l], st["tri"])
        st_t = jnp.where(better, t_c, st["t_best"])
        st_u = jnp.where(better, u[rows, best_l], st["u"])
        st_v = jnp.where(better, v[rows, best_l], st["v"])

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, bvh.hit_link[node], bvh.skip_link[node])
        nxt = jnp.where(active, nxt, 0)
        return dict(node=nxt, t_best=st_t, tri=st_tri, u=st_u, v=st_v)

    state = jax.lax.while_loop(cond, step, state)

    found = state["tri"] >= 0
    orig_tri = jnp.where(found, bvh.perm[jnp.maximum(state["tri"], 0)], 0)
    return Hit(
        t=jnp.where(found, state["t_best"], INF),
        tri=orig_tri.astype(jnp.int32),
        u=state["u"],
        v=state["v"],
    )


@jax.jit
def any_hit_bvh(
    origins: jax.Array,
    dirs: jax.Array,
    bvh: LBVH,
    t_min: jax.Array,
    t_max: jax.Array,
) -> jax.Array:
    """Occlusion query with first-hit early exit per lane."""
    n = origins.shape[0]
    p = bvh.num_leaves
    leaf_size = bvh.leaf_size
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    inv_dir = jnp.where(jnp.abs(dirs) > 1e-20, 1.0 / dirs, jnp.sign(dirs) * 1e20 + 1e20)

    state = dict(node=jnp.ones((n,), jnp.int32), occluded=jnp.zeros((n,), bool))

    def cond(st):
        return jnp.any(st["node"] > 0)

    def step(st):
        node = jnp.maximum(st["node"], 1)
        active = (st["node"] > 0) & ~st["occluded"]
        amin = bvh.aabb_min[node]
        amax = bvh.aabb_max[node]
        box_hit, _ = _slab_test(amin, amax, origins, inv_dir, t_min, t_max)
        box_hit = box_hit & active
        is_leaf = node >= p
        leaf_idx = jnp.where(is_leaf & box_hit, node - p, 0)
        t, _, _, _ = _leaf_intersect(
            leaf_idx, origins, dirs, bvh.sorted_tris, leaf_size, t_min, t_max
        )
        hit_any = jnp.any(
            jnp.where((is_leaf & box_hit)[:, None], t < INF, False), axis=-1
        )
        occluded = st["occluded"] | hit_any
        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, bvh.hit_link[node], bvh.skip_link[node])
        nxt = jnp.where(active & ~occluded, nxt, 0)
        return dict(node=nxt, occluded=occluded)

    state = jax.lax.while_loop(cond, step, state)
    return state["occluded"]
