"""Stackless BVH traversal, shaped for the TPU memory system.

Replaces DXR hardware TraceRay with a lock-step lane walk over the
complete-tree LBVH (ops/bvh.py).  Three TPU-specific design choices keep
the per-iteration cost down (gathers are the expensive primitive on TPU —
they serialize into row DMAs):

  1. skip links are ANALYTIC: in a heap-indexed complete tree,
     descend(k) = 2k and skip(k) = (k >> trailing_ones(k)) + 1 — pure
     integer VPU ops (trailing_ones via population_count), zero memory.
  2. node AABBs live in ONE fused [2P, 6] array: a descend step costs a
     single 6-float gather per lane.
  3. the loop runs D cheap descend substeps per iteration and drains leaf
     hits in a separate batched phase: a lane reaching a leaf parks it in
     a 'pending' register and keeps walking (or stalls if one is already
     parked), so the expensive leaf-block gather + Möller–Trumbore runs
     once per leaf VISIT, not once per traversal STEP.

Closest-hit culls nodes against the running t_best; any-hit exits a lane
on its first confirmed intersection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.ops.bvh import LBVH
from royaltracer_dx_tpu.ops.intersect import Hit, INF

_DESCEND_SUBSTEPS = 8


def _safe_inv(dirs: jax.Array) -> jax.Array:
    """1/dir with sign-preserving +-1e20 for near-zero components."""
    big = jnp.where(dirs >= 0.0, 1e20, -1e20)
    return jnp.where(jnp.abs(dirs) > 1e-20, 1.0 / dirs, big)


def _skip_link(node: jax.Array) -> jax.Array:
    """skip(k) = sibling of the lowest left-child ancestor; 0 = done.

    trailing_ones(k) = ctz(k+1) = popcount((x & -x) - 1) with x = k+1.
    """
    x = (node + 1).astype(jnp.uint32)
    ctz = jax.lax.population_count((x & (~x + jnp.uint32(1))) - jnp.uint32(1))
    anc = (node.astype(jnp.uint32) >> ctz).astype(jnp.int32)
    return jnp.where(anc <= 1, 0, anc + 1)


def _slab_test(box, origin, inv_dir, t_min, t_max):
    """box: [..., 6] = (min_xyz | max_xyz).  Returns hit mask."""
    t0 = (box[..., :3] - origin) * inv_dir
    t1 = (box[..., 3:] - origin) * inv_dir
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    t_enter = jnp.maximum(jnp.max(lo, axis=-1), t_min)
    t_exit = jnp.minimum(jnp.min(hi, axis=-1), t_max)
    return t_enter <= t_exit


def _leaf_mt(leaf_idx, origins, dirs, sorted_tris, leaf_size, t_min, t_max):
    """MT over each lane's pending leaf block.  Returns (t, u, v, tri_ids)."""
    base = leaf_idx * leaf_size
    tri_ids = base[:, None] + jnp.arange(leaf_size)[None, :]
    tv = sorted_tris[tri_ids]                                  # [N, L, 3, 3]
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


@functools.partial(jax.jit, static_argnames=("max_iters",))
def closest_hit_bvh(
    origins: jax.Array,
    dirs: jax.Array,
    bvh: LBVH,
    t_min: float | jax.Array = 1e-4,
    t_max: float | jax.Array = 1e4,
    max_iters: int = 0,
) -> Hit:
    """Closest hit; returns Hit with ORIGINAL triangle ids (bvh.perm)."""
    n = origins.shape[0]
    p = bvh.num_leaves
    leaf_size = bvh.leaf_size
    if max_iters <= 0:
        max_iters = 4 * p + 64
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    inv_dir = _safe_inv(dirs)

    zero = origins[:, 0] * 0.0
    izero = zero.astype(jnp.int32)
    state = dict(
        node=izero + 1,
        pending=izero,
        t_best=t_max0 + zero,
        tri=izero - 1,
        u=zero,
        v=zero,
        iters=jnp.sum(izero),
    )

    def cond(st):
        return jnp.any((st["node"] > 0) | (st["pending"] > 0)) & (st["iters"] < max_iters)

    def body(st):
        node = st["node"]
        pending = st["pending"]
        t_best = st["t_best"]

        # --- descend phase: cheap substeps, park leaves in `pending`
        for _ in range(_DESCEND_SUBSTEPS):
            walk = (node > 0) & (pending == 0)
            safe = jnp.maximum(node, 1)
            box = bvh.nodes[safe]                        # [N, 6] one gather
            hit_box = _slab_test(box, origins, inv_dir, t_min, t_best) & walk
            is_leaf = safe >= p
            pending = jnp.where(walk & is_leaf & hit_box, safe, pending)
            nxt = jnp.where(hit_box & ~is_leaf, 2 * safe, _skip_link(safe))
            node = jnp.where(walk, nxt, node)

        # --- leaf phase: batched MT over parked leaves
        lanes = pending > 0
        leaf_idx = jnp.where(lanes, pending - p, 0)
        t, u, v, tri_ids = _leaf_mt(
            leaf_idx, origins, dirs, bvh.sorted_tris, leaf_size, t_min, t_best
        )
        t = jnp.where(lanes[:, None], t, INF)
        best_l = jnp.argmin(t, axis=-1)
        rows = jnp.arange(n)
        t_c = t[rows, best_l]
        better = t_c < t_best

        return dict(
            node=node,
            pending=izero,
            t_best=jnp.where(better, t_c, t_best),
            tri=jnp.where(better, tri_ids[rows, best_l], st["tri"]),
            u=jnp.where(better, u[rows, best_l], st["u"]),
            v=jnp.where(better, v[rows, best_l], st["v"]),
            iters=st["iters"] + 1,
        )

    state = jax.lax.while_loop(cond, body, state)

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
    max_iters = 4 * p + 64
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    inv_dir = _safe_inv(dirs)

    zero = origins[:, 0] * 0.0
    izero = zero.astype(jnp.int32)
    state = dict(
        node=izero + 1,
        pending=izero,
        occluded=zero > 1.0,
        iters=jnp.sum(izero),
    )

    def cond(st):
        alive = ~st["occluded"]
        return jnp.any(alive & ((st["node"] > 0) | (st["pending"] > 0))) & (
            st["iters"] < max_iters
        )

    def body(st):
        node = st["node"]
        pending = st["pending"]
        occ = st["occluded"]
        for _ in range(_DESCEND_SUBSTEPS):
            walk = (node > 0) & (pending == 0) & ~occ
            safe = jnp.maximum(node, 1)
            box = bvh.nodes[safe]
            hit_box = _slab_test(box, origins, inv_dir, t_min, t_max) & walk
            is_leaf = safe >= p
            pending = jnp.where(walk & is_leaf & hit_box, safe, pending)
            nxt = jnp.where(hit_box & ~is_leaf, 2 * safe, _skip_link(safe))
            node = jnp.where(walk, nxt, node)

        lanes = (pending > 0) & ~occ
        leaf_idx = jnp.where(lanes, pending - p, 0)
        t, _, _, _ = _leaf_mt(
            leaf_idx, origins, dirs, bvh.sorted_tris, leaf_size, t_min, t_max
        )
        hit_any = jnp.any(jnp.where(lanes[:, None], t < INF, False), axis=-1)
        return dict(
            node=node,
            pending=izero,
            occluded=occ | hit_any,
            iters=st["iters"] + 1,
        )

    state = jax.lax.while_loop(cond, body, state)
    return state["occluded"]
