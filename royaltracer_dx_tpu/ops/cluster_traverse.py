"""Tile-clustered traversal: the TPU-native mid-scale acceleration scheme.

Replaces per-ray BVH descent (BottomLevelASGenerator.cpp:235 /
DXR TraceRay) with a two-phase plan that never does a per-LANE gather:

  build    Triangles are morton-ordered by centroid and grouped into
           clusters of G=128 (one full VPU lane tile); each cluster gets a
           conservative AABB.  Cluster records store v0/e1/e2 component-
           major so traversal unpacks them with free slices.

  phase A  Every ray slab-tests every cluster AABB — dense, planar,
           full-lane work — and the per-ray masks are OR-reduced over
           fixed tiles of R consecutive rays: a conservative per-TILE
           cluster worklist (sorted mask -> indices, count per tile).

  phase B  A lax.while_loop runs max(count) rounds; each round every tile
           fetches ONE cluster record (a single [tiles]-row wide gather —
           ~7ns/row x tiles, not x rays) and runs dense Möller–Trumbore
           of its R rays against the cluster's 128 triangles in planar
           [tiles, R, G] form.  Tiles past their own count contribute
           masked no-ops.

Lock-step cost is max-over-tiles of overlapped-cluster count, so the
scheme exploits RAY COHERENCE: consecutive rays (image order for primary
rays; morton/octant-sorted for secondary) share cluster sets.  Against
the reference: this is the BLAS/TLAS + fixed-function traversal
replacement for scenes where a brute sweep stops being fast.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from royaltracer_dx_tpu.ops.bvh import morton_codes
from royaltracer_dx_tpu.ops.intersect import INF, Hit

_DET_EPS = 1e-12


@flax.struct.dataclass
class Clusters:
    """Morton-clustered triangle soup (device arrays)."""

    tri_planes: jax.Array  # [C, 9, G] v0/e1/e2 xyz, component-major
    tri_index: jax.Array   # [C, G] int32 original triangle id (pad: 0)
    aabb_lo: jax.Array     # [C, 3]
    aabb_hi: jax.Array     # [C, 3]

    @property
    def num_clusters(self) -> int:
        return self.tri_planes.shape[0]

    @property
    def group(self) -> int:
        return self.tri_planes.shape[2]


def build_clusters(tri_verts: jax.Array, group: int = 128) -> Clusters:
    """Cluster triangles by centroid morton order (host-side build).

    Padding triangles are degenerate (all-zero) — their MT determinant is
    zero so they never hit; the padded clusters' AABBs are point-sized at
    the scene minimum and almost never survive the slab test.
    """
    tv = np.asarray(tri_verts, np.float32)
    t_count = tv.shape[0]
    centroid = tv.mean(axis=1)
    lo = centroid.min(axis=0)
    hi = centroid.max(axis=0)
    codes = np.asarray(morton_codes(jnp.asarray(centroid), jnp.asarray(lo),
                                    jnp.asarray(hi)))
    order = np.argsort(codes, kind="stable").astype(np.int32)
    pad = (-t_count) % group
    order_p = np.concatenate([order, np.full(pad, -1, np.int32)])
    c = order_p.size // group

    tv_sorted = np.zeros((t_count + pad, 3, 3), np.float32)
    tv_sorted[:t_count] = tv[order]
    tri_index = np.where(order_p < 0, 0, order_p).reshape(c, group)

    v0 = tv_sorted[:, 0]
    e1 = tv_sorted[:, 1] - tv_sorted[:, 0]
    e2 = tv_sorted[:, 2] - tv_sorted[:, 0]
    planes = np.concatenate([v0, e1, e2], axis=1)        # [T', 9]
    tri_planes = planes.reshape(c, group, 9).transpose(0, 2, 1)  # [C, 9, G]

    tvc = tv_sorted.reshape(c, group, 3, 3)
    real = (order_p >= 0).reshape(c, group)[..., None, None]
    big = np.float32(3.0e38)
    aabb_lo = np.where(real, tvc, big).min(axis=(1, 2))
    aabb_hi = np.where(real, tvc, -big).max(axis=(1, 2))
    empty = ~real.reshape(c, group).any(axis=1)
    aabb_lo = np.where(empty[:, None], lo, aabb_lo)
    aabb_hi = np.where(empty[:, None], lo, aabb_hi)

    return Clusters(
        tri_planes=jnp.asarray(tri_planes),
        tri_index=jnp.asarray(tri_index),
        aabb_lo=jnp.asarray(aabb_lo),
        aabb_hi=jnp.asarray(aabb_hi),
    )


def _tile_cluster_mask(origins, dirs, cl: Clusters, t_min, t_max, tile: int):
    """Phase A: conservative [tiles, C] overlap mask + per-tile entry
    distance via planar slab tests.

    t_min/t_max: [N] planes.  Scans clusters in 128-wide blocks to bound
    the [N, block] temporaries.  Returns (mask [tiles, C], entry [tiles, C]
    — min-over-rays slab entry t, INF where no overlap)."""
    n = origins.shape[0]
    c_count = cl.num_clusters
    block = 128
    pad_c = (-c_count) % block
    lo = jnp.pad(cl.aabb_lo, ((0, pad_c), (0, 0)), constant_values=3.0e38)
    hi = jnp.pad(cl.aabb_hi, ((0, pad_c), (0, 0)), constant_values=-3.0e38)
    nb = lo.shape[0] // block
    lo_b = lo.reshape(nb, block, 3)
    hi_b = hi.reshape(nb, block, 3)

    o = [origins[:, c:c + 1] for c in range(3)]          # [N, 1]
    inv = [
        jnp.where(jnp.abs(dirs[:, c:c + 1]) > 1e-12,
                  1.0 / dirs[:, c:c + 1], 3.0e38)
        for c in range(3)
    ]
    t_min_p = t_min[:, None]
    t_max_p = t_max[:, None]

    def step(_, boxes):
        blo, bhi = boxes
        tn = t_min_p
        tf = t_max_p
        for c in range(3):
            t0 = (blo[:, c] - o[c]) * inv[c]             # [N, block]
            t1 = (bhi[:, c] - o[c]) * inv[c]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        overlap = (tn <= tf).reshape(n // tile, tile, block)
        entry = jnp.where(overlap, tn.reshape(n // tile, tile, block), INF)
        return None, (jnp.any(overlap, axis=1), jnp.min(entry, axis=1))

    _, (mask, entry) = jax.lax.scan(step, None, (lo_b, hi_b))  # [nb, tiles, block]
    mask = jnp.moveaxis(mask, 0, 1).reshape(n // tile, nb * block)
    entry = jnp.moveaxis(entry, 0, 1).reshape(n // tile, nb * block)
    return mask[:, :c_count], entry[:, :c_count]


def _mt_tile(o, d, planes9, t_min, t_max):
    """Möller–Trumbore of [tiles, R] rays vs [tiles, G] cluster triangles.

    o/d: 3 planes of [tiles, R, 1]; planes9: [tiles, 9, G] record rows;
    t_min/t_max: [tiles, R, 1].  Returns (t, u, v) of [tiles, R, G]."""
    tri = [planes9[:, c, None, :] for c in range(9)]     # [tiles, 1, G]
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = tri
    ox, oy, oz = o
    dx, dy, dz = d
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min) & (t < t_max)
    )
    return jnp.where(ok, t, INF), u, v


def _tile_cluster_mask_interval(origins, dirs, cl: Clusters, t_min, t_max,
                                tile: int):
    """Interval-arithmetic phase A: per-TILE conservative bounds instead of
    per-ray slab tests — O(tiles x C) work, ~R times cheaper than the exact
    mask.  Sound (a superset of the exact mask: interval products bound
    every ray in the tile) but fatter, so phase B runs more rounds.

    Measured (menger 1.92M tris, 512x512 primary rays, tile=128): LOSES to
    the exact mask today (838 vs 552 ms) because rays arrive in row-major
    order — a 128-ray tile is a 128x1 pixel sliver whose interval frustum
    is very fat.  It pays off once rays are swizzled into square pixel
    blocks (the MapPixelID analog) — the planned round-2 change; kept here
    correct and parity-tested.  Returns (mask, entry-lower-bound).
    """
    n = origins.shape[0]
    tiles = n // tile
    c_count = cl.num_clusters

    def tile_minmax(a):  # [N] -> ([tiles, 1], [tiles, 1])
        a = a.reshape(tiles, tile)
        return a.min(axis=1, keepdims=True), a.max(axis=1, keepdims=True)

    big = jnp.float32(3.0e38)
    tn_lb = tile_minmax(t_min)[0]                        # loosest near
    tf_ub = tile_minmax(t_max)[1]
    mask_parts = []
    entry_parts = []
    for c in range(3):
        o_lo, o_hi = tile_minmax(origins[:, c])
        d_lo, d_hi = tile_minmax(dirs[:, c])
        lo = cl.aabb_lo[None, :, c]                      # [1, C]
        hi = cl.aabb_hi[None, :, c]
        # d interval containing 0 -> axis constrains nothing for this tile
        unconstrained = (d_lo <= 0.0) & (d_hi >= 0.0)
        safe_lo = jnp.where(unconstrained, 1.0, d_lo)
        safe_hi = jnp.where(unconstrained, 1.0, d_hi)
        i1 = 1.0 / safe_hi
        i2 = 1.0 / safe_lo
        # plane-distance intervals: a = lo - o, b = hi - o
        a1, a2 = lo - o_hi, lo - o_lo
        b1, b2 = hi - o_hi, hi - o_lo
        prods = [a1 * i1, a1 * i2, a2 * i1, a2 * i2,
                 b1 * i1, b1 * i2, b2 * i1, b2 * i2]
        p_min = prods[0]
        p_max = prods[0]
        for p in prods[1:]:
            p_min = jnp.minimum(p_min, p)
            p_max = jnp.maximum(p_max, p)
        near_lb = jnp.where(unconstrained, -big, p_min)  # [tiles, C]
        far_ub = jnp.where(unconstrained, big, p_max)
        entry_parts.append(near_lb)
        mask_parts.append((near_lb, far_ub))

    tn = tn_lb
    tf = tf_ub
    for near_lb, far_ub in mask_parts:
        tn = jnp.maximum(tn, near_lb)
        tf = jnp.minimum(tf, far_ub)
    mask = tn <= tf
    entry = jnp.where(mask, tn, INF)
    return mask, entry


def _pad_rays(origins, dirs, t_min, t_max, tile):
    n = origins.shape[0]
    pad = (-n) % tile
    if pad:
        origins = jnp.pad(origins, ((0, pad), (0, 0)))
        dirs = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
        t_min = jnp.pad(t_min, (0, pad))
        t_max = jnp.pad(t_max, (0, pad), constant_values=-1.0)  # never hits
    return origins, dirs, t_min, t_max, n


def _segment_sizes(tiles: int, factor: int = 4) -> list[int]:
    """Shrinking working-set schedule: [tiles, tiles/4, ...] (min 1)."""
    sizes = [tiles]
    while sizes[-1] > factor:
        sizes.append(max(1, sizes[-1] // factor))
    return sizes


@functools.partial(jax.jit, static_argnames=("tile", "mask_mode"))
def closest_hit_clustered(
    origins: jax.Array,
    dirs: jax.Array,
    cl: Clusters,
    t_min: float | jax.Array = 1e-4,
    t_max: float | jax.Array = 1e4,
    tile: int = 128,
    mask_mode: str = "exact",
) -> Hit:
    """Closest hit via the tile-clustered plan.  origins/dirs: [N, 3].

    Tiles are processed SORTED BY WORKLOAD, descending, and the lock-step
    while loop runs over a shrinking prefix of them (factor-4 segments):
    total work tracks the area under the sorted per-tile cluster-count
    curve instead of tiles x max(count), which matters enormously for the
    skewed counts real scenes produce (p50 ~ a few, max ~ hundreds)."""
    n0 = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n0,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n0,))
    origins, dirs, t_min, t_max, n0 = _pad_rays(origins, dirs, t_min, t_max, tile)
    n = origins.shape[0]
    tiles = n // tile

    if mask_mode == "interval":
        mask, entry = _tile_cluster_mask_interval(
            origins, dirs, cl, t_min, t_max, tile)
    else:
        mask, entry = _tile_cluster_mask(origins, dirs, cl, t_min, t_max, tile)
    # NEAR-TO-FAR per-tile ordering (entry is INF for non-overlapped) so a
    # tile can retire as soon as every remaining cluster starts beyond its
    # farthest unresolved ray
    cids = jnp.broadcast_to(
        jnp.arange(entry.shape[1], dtype=jnp.int32)[None, :], entry.shape
    )
    entry_sorted, worklist = jax.lax.sort((entry, cids), dimension=1, num_keys=1)
    count = jnp.sum(mask.astype(jnp.int32), axis=1)       # [tiles]

    # busiest tiles first; per-tile rows are cheap [tiles]-row gathers
    perm = jnp.argsort(-count)
    inv_perm = jnp.argsort(perm)
    count = count[perm]
    worklist = worklist[perm]
    entry_sorted = entry_sorted[perm]

    def tp(a):  # [N] -> permuted [tiles, tile, 1]
        return a.reshape(tiles, tile)[perm][..., None]

    o = [tp(origins[:, c]) for c in range(3)]
    d = [tp(dirs[:, c]) for c in range(3)]
    t_min_t = tp(t_min)
    t_max_t = tp(t_max)
    t_max_2d = t_max_t[..., 0]
    lane = jax.lax.iota(jnp.int32, cl.group)[None, None, :]

    zero = jnp.zeros((tiles, tile), jnp.float32)
    best = (zero + INF, zero.astype(jnp.int32), zero, zero)
    k = jnp.int32(0)
    c_count = mask.shape[1]

    def pending(k, best_t, lo, hi):
        # rows [lo:hi]: a tile retires when every remaining (near-to-far)
        # cluster starts beyond its farthest unresolved ray; misses
        # resolve at their t_max
        nxt = jax.lax.dynamic_slice_in_dim(
            entry_sorted[lo:hi], k, 1, axis=1)[:, 0]
        bound = jnp.max(jnp.minimum(best_t[lo:hi], t_max_2d[lo:hi]), axis=1)
        return (k < count[lo:hi]) & (nxt < bound)

    sizes = _segment_sizes(tiles)
    for si, size in enumerate(sizes):
        lower = sizes[si + 1] if si + 1 < len(sizes) else 0
        wl_s = worklist[:size]
        cnt_s = count[:size]
        o_s = [c[:size] for c in o]
        d_s = [c[:size] for c in d]
        tmin_s = t_min_t[:size]
        tmax_s = t_max_t[:size]

        def cond(st, lower=lower, size=size):
            kk, best_t = st[0], st[1]
            return (kk < c_count) & jnp.any(pending(kk, best_t, lower, size))

        def body(st, size=size, wl_s=wl_s, cnt_s=cnt_s, o_s=o_s, d_s=d_s,
                 tmin_s=tmin_s, tmax_s=tmax_s):
            kk, best_t, best_tri, best_u, best_v = st
            cid = jax.lax.dynamic_slice_in_dim(wl_s, kk, 1, axis=1)[:, 0]
            rows = cl.tri_planes[cid]                     # [size, 9, G]
            tidx = cl.tri_index[cid]                      # [size, G]
            active = pending(kk, best_t, 0, size)[:, None, None]
            t, u, v = _mt_tile(o_s, d_s, rows, tmin_s, tmax_s)
            t = jnp.where(active, t, INF)
            t_c = jnp.min(t, axis=-1)                     # [size, R]
            idx = jnp.argmin(t, axis=-1)
            hot = idx[..., None] == lane
            u_c = jnp.sum(jnp.where(hot, u, 0.0), axis=-1)
            v_c = jnp.sum(jnp.where(hot, v, 0.0), axis=-1)
            tri_c = jnp.sum(jnp.where(hot, tidx[:, None, :], 0), axis=-1)
            better = t_c < best_t
            return (
                kk + 1,
                jnp.where(better, t_c, best_t),
                jnp.where(better, tri_c, best_tri),
                jnp.where(better, u_c, best_u),
                jnp.where(better, v_c, best_v),
            )

        st = (k,) + tuple(b[:size] for b in best)
        st = jax.lax.while_loop(cond, body, st)
        k = st[0]
        best = tuple(
            jnp.concatenate([new, old[size:]], axis=0)
            for new, old in zip(st[1:], best)
        )

    t, tri, u, v = (b[inv_perm].reshape(n)[:n0] for b in best)
    return Hit(t=t, tri=tri, u=u, v=v)


@functools.partial(jax.jit, static_argnames=("tile", "mask_mode"))
def any_hit_clustered(
    origins: jax.Array,
    dirs: jax.Array,
    cl: Clusters,
    t_min: jax.Array,
    t_max: jax.Array,
    tile: int = 128,
    mask_mode: str = "exact",
) -> jax.Array:
    """Occlusion query via the tile-clustered plan: same sorted shrinking-
    prefix schedule as closest_hit_clustered; a tile retires when all its
    rays are occluded or its worklist is exhausted."""
    n0 = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n0,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n0,))
    origins, dirs, t_min, t_max, n0 = _pad_rays(origins, dirs, t_min, t_max, tile)
    n = origins.shape[0]
    tiles = n // tile

    if mask_mode == "interval":
        mask, entry = _tile_cluster_mask_interval(
            origins, dirs, cl, t_min, t_max, tile)
    else:
        mask, entry = _tile_cluster_mask(origins, dirs, cl, t_min, t_max, tile)
    cids = jnp.broadcast_to(
        jnp.arange(entry.shape[1], dtype=jnp.int32)[None, :], entry.shape
    )
    _, worklist = jax.lax.sort((entry, cids), dimension=1, num_keys=1)
    count = jnp.sum(mask.astype(jnp.int32), axis=1)

    perm = jnp.argsort(-count)
    inv_perm = jnp.argsort(perm)
    count = count[perm]
    worklist = worklist[perm]

    def tp(a):
        return a.reshape(tiles, tile)[perm][..., None]

    o = [tp(origins[:, c]) for c in range(3)]
    d = [tp(dirs[:, c]) for c in range(3)]
    t_min_t = tp(t_min)
    t_max_t = tp(t_max)

    occ = jnp.zeros((tiles, tile), bool)
    k = jnp.int32(0)
    c_count = mask.shape[1]

    def pending(k, occ_s, lo, hi):
        return (k < count[lo:hi]) & ~jnp.all(occ_s[lo:hi], axis=1)

    sizes = _segment_sizes(tiles)
    for si, size in enumerate(sizes):
        lower = sizes[si + 1] if si + 1 < len(sizes) else 0
        wl_s = worklist[:size]
        o_s = [c[:size] for c in o]
        d_s = [c[:size] for c in d]
        tmin_s = t_min_t[:size]
        tmax_s = t_max_t[:size]

        def cond(st, lower=lower, size=size):
            kk, occ_s = st
            return (kk < c_count) & jnp.any(pending(kk, occ_s, lower, size))

        def body(st, size=size, wl_s=wl_s, o_s=o_s, d_s=d_s,
                 tmin_s=tmin_s, tmax_s=tmax_s):
            kk, occ_s = st
            cid = jax.lax.dynamic_slice_in_dim(wl_s, kk, 1, axis=1)[:, 0]
            rows = cl.tri_planes[cid]
            active = pending(kk, occ_s, 0, size)[:, None, None]
            t, _, _ = _mt_tile(o_s, d_s, rows, tmin_s, tmax_s)
            hit = jnp.any(jnp.where(active, t, INF) < INF, axis=-1)
            return kk + 1, occ_s | hit

        kk, occ_s = jax.lax.while_loop(cond, body, (k, occ[:size]))
        k = kk
        occ = jnp.concatenate([occ_s, occ[size:]], axis=0)

    return occ[inv_perm].reshape(n)[:n0]
