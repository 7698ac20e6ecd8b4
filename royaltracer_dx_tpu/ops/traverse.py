"""BVH traversal, third TPU-shaped iteration: dense top, ordered subtrees.

Measured constraint (see PLAN.md): XLA:TPU gathers cost ~7 ns per ROW
independent of row width (~140M rows/s), so traversal throughput is set by
gathered-rows-per-ray.  This design minimizes them:

  1. DENSE TOP: the S = min(256, P) subtree roots at one heap level are
     slab-tested against every ray as a broadcast [N, S] computation — no
     gathers, pure VPU — yielding per-ray entry distances.
  2. ORDERED WALK: each ray sorts its hit subtrees near-to-far and walks
     them in order; a subtree whose entry distance exceeds the running
     t_best is skipped entirely, so closest-hit usually walks ONE subtree.
  3. Inside a subtree: analytic skip-link descent (2k / popcount skip, no
     link tables), one fused 6-float node row per visit, and leaf blocks
     fetched as a SINGLE row of ls*9 floats (not ls separate rows).

Lanes still run lock-step (a jax.lax.while_loop over the batch), but the
ordering + culling collapses the per-lane visit count that made the tail
expensive.  The Pallas ray-stream kernel is the planned next step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from royaltracer_dx_tpu.ops.bvh import LBVH
from royaltracer_dx_tpu.ops.intersect import Hit, INF

_DESCEND_SUBSTEPS = 4
_MAX_TOP = 256


def _safe_inv(dirs: jax.Array) -> jax.Array:
    big = jnp.where(dirs >= 0.0, 1e20, -1e20)
    return jnp.where(jnp.abs(dirs) > 1e-20, 1.0 / dirs, big)


def _bitlen(x: jax.Array) -> jax.Array:
    """Number of significant bits (x > 0)."""
    x = x.astype(jnp.uint32)
    x = x | (x >> 1)
    x = x | (x >> 2)
    x = x | (x >> 4)
    x = x | (x >> 8)
    x = x | (x >> 16)
    return jax.lax.population_count(x).astype(jnp.int32)


def _skip_link(node: jax.Array) -> jax.Array:
    """skip(k) = sibling of the lowest left-child ancestor; 0 at root."""
    x = (node + 1).astype(jnp.uint32)
    ctz = jax.lax.population_count((x & (~x + jnp.uint32(1))) - jnp.uint32(1))
    anc = (node.astype(jnp.uint32) >> ctz).astype(jnp.int32)
    return jnp.where(anc <= 1, 0, anc + 1)


def _in_subtree(node: jax.Array, root: jax.Array) -> jax.Array:
    """True if heap node is a descendant-or-self of heap root (>0)."""
    shift = jnp.maximum(_bitlen(node) - _bitlen(root), 0)
    return (node > 0) & ((node >> shift) == root)


def _slab(box_min, box_max, origin, inv_dir, t_min, t_max):
    """Returns (hit, t_enter)."""
    t0 = (box_min - origin) * inv_dir
    t1 = (box_max - origin) * inv_dir
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    t_enter = jnp.maximum(jnp.max(lo, axis=-1), t_min)
    t_exit = jnp.minimum(jnp.min(hi, axis=-1), t_max)
    return t_enter <= t_exit, t_enter


def _top_level(p: int) -> tuple[int, int]:
    """(S, root_base): S subtree roots live at heap ids [S, 2S)."""
    s = min(_MAX_TOP, p)
    return s, s


def _dense_top_order(bvh: LBVH, origins, dirs, inv_dir, t_min, t_max):
    """Phase 1+2: dense slab over the S roots, near-to-far order.

    Returns (order [N, S] subtree ROOT ids sorted by entry, t_sorted [N, S]
    entry distances, INF where missed)."""
    p = bvh.num_leaves
    s, base = _top_level(p)
    roots = bvh.nodes[base : 2 * base]                        # [S, 6]
    bmin = roots[None, :, :3]
    bmax = roots[None, :, 3:]
    hit, t_enter = _slab(
        bmin, bmax, origins[:, None, :], inv_dir[:, None, :],
        t_min[:, None], t_max[:, None],
    )
    key = jnp.where(hit, t_enter, INF)                        # [N, S]
    order = jnp.argsort(key, axis=-1).astype(jnp.int32) + base
    return order, jnp.sort(key, axis=-1)


def _make_state(origins, t_max0, extra):
    zero = origins[:, 0] * 0.0
    izero = zero.astype(jnp.int32)
    st = dict(
        slot=izero,          # next entry in the per-ray subtree order
        node=izero,          # current node (0 = fetch next subtree)
        root=izero + 1,      # current subtree root (walk boundary)
        pending=izero,       # parked leaf node id
        iters=jnp.sum(izero),
    )
    st.update(extra(zero, izero))
    return st


@functools.partial(jax.jit, static_argnames=("max_iters",))
def closest_hit_bvh(
    origins: jax.Array,
    dirs: jax.Array,
    bvh: LBVH,
    t_min: float | jax.Array = 1e-4,
    t_max: float | jax.Array = 1e4,
    max_iters: int = 0,
) -> Hit:
    """Closest hit; Hit.tri holds ORIGINAL triangle ids (bvh.perm)."""
    n = origins.shape[0]
    p = bvh.num_leaves
    ls = bvh.leaf_size
    s, base = _top_level(p)
    if max_iters <= 0:
        max_iters = 4 * p + 4 * s + 64
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    inv_dir = _safe_inv(dirs)
    leaf_rows = bvh.sorted_tris.reshape(p, ls * 9)

    order, t_sorted = _dense_top_order(bvh, origins, dirs, inv_dir, t_min, t_max0)

    def extra(zero, izero):
        return dict(t_best=t_max0 + zero, tri=izero - 1, u=zero, v=zero)

    state = _make_state(origins, t_max0, extra)

    def cond(st):
        alive = (st["node"] > 0) | (st["pending"] > 0) | (st["slot"] < s)
        return jnp.any(alive) & (st["iters"] < max_iters)

    def body(st):
        node = st["node"]
        pending = st["pending"]
        slot = st["slot"]
        t_best = st["t_best"]

        # --- subtree transition: lanes with no node fetch their next
        # ordered subtree, skipping ones already beaten by t_best
        need = (node == 0) & (pending == 0) & (slot < s)
        slot_c = jnp.minimum(slot, s - 1)
        t_e = jnp.take_along_axis(t_sorted, slot_c[:, None], axis=1)[:, 0]
        sub = jnp.take_along_axis(order, slot_c[:, None], axis=1)[:, 0]
        viable = need & (t_e < t_best)
        exhausted = need & (t_e >= t_best)          # ordered => all done
        node = jnp.where(viable, sub, node)
        root = jnp.where(viable, sub, st["root"])
        slot = jnp.where(viable, slot + 1, jnp.where(exhausted, s, slot))

        # --- bounded descend substeps within the subtree; the analytic skip
        # walks the GLOBAL tree, so any step that leaves the current
        # subtree (no longer a descendant of `root`) ends the walk
        for _ in range(_DESCEND_SUBSTEPS):
            walk = (node > 0) & (pending == 0)
            safe = jnp.maximum(node, 1)
            box = bvh.nodes[safe]
            hit_box, _ = _slab(box[:, :3], box[:, 3:], origins, inv_dir,
                               t_min, t_best)
            hit_box = hit_box & walk
            is_leaf = safe >= p
            pending = jnp.where(walk & is_leaf & hit_box, safe, pending)
            nxt = jnp.where(hit_box & ~is_leaf, 2 * safe, _skip_link(safe))
            nxt = jnp.where(_in_subtree(nxt, root), nxt, 0)
            node = jnp.where(walk, nxt, node)

        # --- leaf phase: single-row block fetch + dense MT
        lanes = pending > 0
        leaf_idx = jnp.where(lanes, pending - p, 0)
        block = leaf_rows[leaf_idx].reshape(-1, ls, 3, 3)     # one row/lane
        v0 = block[..., 0, :]
        e1 = block[..., 1, :] - v0
        e2 = block[..., 2, :] - v0
        d = dirs[:, None, :]
        o = origins[:, None, :]
        pc = jnp.cross(d, e2)
        det = jnp.sum(e1 * pc, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvec = o - v0
        uu = jnp.sum(tvec * pc, axis=-1) * inv_det
        q = jnp.cross(tvec, e1)
        vv = jnp.sum(d * q, axis=-1) * inv_det
        t = jnp.sum(e2 * q, axis=-1) * inv_det
        ok = (
            (jnp.abs(det) > 1e-12)
            & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (t > t_min[:, None]) & (t < t_best[:, None])
            & lanes[:, None]
        )
        t = jnp.where(ok, t, INF)
        best_l = jnp.argmin(t, axis=-1)
        rows = jnp.arange(n)
        t_c = t[rows, best_l]
        better = t_c < t_best
        tri_ids = leaf_idx * ls + best_l

        return dict(
            slot=slot,
            node=node,
            root=root,
            pending=jnp.zeros_like(pending),
            iters=st["iters"] + 1,
            t_best=jnp.where(better, t_c, t_best),
            tri=jnp.where(better, tri_ids, st["tri"]),
            u=jnp.where(better, uu[rows, best_l], st["u"]),
            v=jnp.where(better, vv[rows, best_l], st["v"]),
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
    """Occlusion query: first confirmed hit retires the lane."""
    n = origins.shape[0]
    p = bvh.num_leaves
    ls = bvh.leaf_size
    s, base = _top_level(p)
    max_iters = 4 * p + 4 * s + 64
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    inv_dir = _safe_inv(dirs)
    leaf_rows = bvh.sorted_tris.reshape(p, ls * 9)

    order, t_sorted = _dense_top_order(bvh, origins, dirs, inv_dir, t_min, t_max)

    def extra(zero, izero):
        return dict(occluded=zero > 1.0)

    state = _make_state(origins, t_max, extra)

    def cond(st):
        alive = ~st["occluded"] & (
            (st["node"] > 0) | (st["pending"] > 0) | (st["slot"] < s)
        )
        return jnp.any(alive) & (st["iters"] < max_iters)

    def body(st):
        node = st["node"]
        pending = st["pending"]
        slot = st["slot"]
        occ = st["occluded"]

        need = (node == 0) & (pending == 0) & (slot < s) & ~occ
        slot_c = jnp.minimum(slot, s - 1)
        t_e = jnp.take_along_axis(t_sorted, slot_c[:, None], axis=1)[:, 0]
        sub = jnp.take_along_axis(order, slot_c[:, None], axis=1)[:, 0]
        viable = need & (t_e < INF)
        exhausted = need & ~viable
        node = jnp.where(viable, sub, node)
        root = jnp.where(viable, sub, st["root"])
        slot = jnp.where(viable, slot + 1, jnp.where(exhausted, s, slot))

        for _ in range(_DESCEND_SUBSTEPS):
            walk = (node > 0) & (pending == 0) & ~occ
            safe = jnp.maximum(node, 1)
            box = bvh.nodes[safe]
            hit_box, _ = _slab(box[:, :3], box[:, 3:], origins, inv_dir,
                               t_min, t_max)
            hit_box = hit_box & walk
            is_leaf = safe >= p
            pending = jnp.where(walk & is_leaf & hit_box, safe, pending)
            nxt = jnp.where(hit_box & ~is_leaf, 2 * safe, _skip_link(safe))
            nxt = jnp.where(_in_subtree(nxt, root), nxt, 0)
            node = jnp.where(walk, nxt, node)

        lanes = (pending > 0) & ~occ
        leaf_idx = jnp.where(lanes, pending - p, 0)
        block = leaf_rows[leaf_idx].reshape(-1, ls, 3, 3)
        v0 = block[..., 0, :]
        e1 = block[..., 1, :] - v0
        e2 = block[..., 2, :] - v0
        d = dirs[:, None, :]
        o = origins[:, None, :]
        pc = jnp.cross(d, e2)
        det = jnp.sum(e1 * pc, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvec = o - v0
        uu = jnp.sum(tvec * pc, axis=-1) * inv_det
        q = jnp.cross(tvec, e1)
        vv = jnp.sum(d * q, axis=-1) * inv_det
        t = jnp.sum(e2 * q, axis=-1) * inv_det
        ok = (
            (jnp.abs(det) > 1e-12)
            & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (t > t_min[:, None]) & (t < t_max[:, None])
            & lanes[:, None]
        )
        return dict(
            slot=slot,
            node=node,
            root=root,
            pending=jnp.zeros_like(pending),
            iters=st["iters"] + 1,
            occluded=occ | jnp.any(ok, axis=-1),
        )

    state = jax.lax.while_loop(cond, body, state)
    return state["occluded"]
