"""On-device LBVH: Morton-ordered complete-tree BVH, built and refit in JAX.

Replaces the driver-side acceleration structures the reference delegates to
D3D12 (BottomLevelASGenerator.cpp:235 / TopLevelASGenerator.cpp:240
BuildRaytracingAccelerationStructure + per-frame refit, Renderer.cpp:594)
with a fully TPU-resident design chosen for the hardware rather than a port
of a CUDA Karras builder:

  * build = Morton-code the triangle centroids, sort (XLA sort), group
    ``leaf_size`` consecutive triangles per leaf, then reduce AABBs up a
    COMPLETE binary tree (pure reshape+min/max — dense, layout-friendly,
    no atomics, no scatter).
  * the tree TOPOLOGY is static for a given leaf count, so the DFS
    skip-links used by the stackless traversal are precomputed host-side
    once and reused for every rebuild/refit (they depend only on the padded
    leaf count, not the geometry).
  * refit = re-run the sort-free reduction with the existing ordering —
    the exact analog of the reference's TLAS updateOnly path.
  * traversal (traverse.py) walks hit/skip links in DFS order — one box
    test per step, no per-lane stack, every operation a gather + VPU math.

Quality note: a fixed topology over Morton order is the classic "LBVH"
tradeoff (fast build, slightly more node overlap than SAH/Karras trees);
the Morton sort still provides the spatial clustering that matters.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.float32(1e30)


# ----------------------------- morton codes -----------------------------


def _expand_bits_10(v: jax.Array) -> jax.Array:
    """Spread 10 bits to every 3rd bit (uint32)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(points: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """30-bit Morton codes for points normalized into [lo, hi]."""
    extent = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((points - lo) / extent, 0.0, 0.99999994)
    q = (q * 1024.0).astype(jnp.uint32)
    q = jnp.minimum(q, 1023)
    return (
        (_expand_bits_10(q[..., 0]) << 2)
        | (_expand_bits_10(q[..., 1]) << 1)
        | _expand_bits_10(q[..., 2])
    )


# ------------------------- static DFS skip links ------------------------


@functools.lru_cache(maxsize=32)
def dfs_links(num_leaves_pow2: int, leaf_base: int) -> tuple[np.ndarray, np.ndarray]:
    """(hit_link, skip_link) for a heap-indexed complete binary tree.

    Nodes are 1-indexed: node k has children 2k, 2k+1; leaves occupy
    [leaf_base, leaf_base + P).  skip(k) jumps over k's subtree in DFS
    preorder: climb while k is a right child (odd), then step to the
    sibling; 0 = traversal done.  hit(k) descends (2k) for internal nodes
    and equals skip(k) for leaves.

    Topology-only: depends on P, NOT on geometry — computed once per
    shape, vectorized numpy.
    """
    p = num_leaves_pow2
    total = 2 * p  # 1-indexed array size (index 0 unused)
    k = np.arange(total, dtype=np.int64)
    # climb while odd: strip trailing 1-bits
    kk = k.copy()
    kk = np.where(kk > 0, kk, 1)
    # number of trailing ones of kk
    trailing_ones = np.zeros(total, dtype=np.int64)
    tmp = kk.copy()
    for _ in range(int(np.log2(max(p, 2))) + 2):
        is_odd = (tmp & 1) == 1
        trailing_ones += is_odd
        tmp = np.where(is_odd, tmp >> 1, tmp)
    anc = k >> np.minimum(trailing_ones, 62)
    skip = np.where(anc <= 1, 0, anc + 1)
    hit = np.where(k < p, 2 * k, skip)  # internal: descend
    skip[0] = 0
    hit[0] = 0
    return hit.astype(np.int32), skip.astype(np.int32)


# ------------------------------ structure -------------------------------


@flax.struct.dataclass
class LBVH:
    """Complete-tree LBVH over Morton-sorted triangles.

    Heap node k in [1, 2P) stores its AABB as one fused 6-float record
    (min_xyz | max_xyz) so a traversal step costs one gather.  Leaves are
    nodes [P, 2P); leaf j holds triangles
    sorted_tris[j*leaf_size:(j+1)*leaf_size] (padded slots are degenerate
    and never intersect).  ``perm`` maps sorted-triangle slots back to
    original triangle ids (-1 = padding).  Child/skip links are analytic
    (see ops/traverse.py) — no link tables.
    """

    nodes: jax.Array        # [2P, 6] = (aabb_min | aabb_max)
    sorted_tris: jax.Array  # [P*leaf_size, 3, 3]
    perm: jax.Array         # [P*leaf_size] int32, original tri id or -1

    @property
    def aabb_min(self) -> jax.Array:
        return self.nodes[:, :3]

    @property
    def aabb_max(self) -> jax.Array:
        return self.nodes[:, 3:]

    @property
    def num_leaves(self) -> int:
        return self.nodes.shape[0] // 2

    @property
    def leaf_size(self) -> int:
        return self.sorted_tris.shape[0] // self.num_leaves


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _reduce_levels(leaf_min: jax.Array, leaf_max: jax.Array):
    """Bottom-up pairwise AABB reduction → heap arrays [2P, 3]."""
    p = leaf_min.shape[0]
    mins = [leaf_min]
    maxs = [leaf_max]
    while mins[-1].shape[0] > 1:
        m = mins[-1].reshape(-1, 2, 3)
        x = maxs[-1].reshape(-1, 2, 3)
        mins.append(jnp.min(m, axis=1))
        maxs.append(jnp.max(x, axis=1))
    # heap layout: level l (size p>>l) occupies [p>>l, 2*(p>>l))
    nodes = jnp.concatenate(
        [jnp.full((2 * p, 3), INF), jnp.full((2 * p, 3), -INF)], axis=1
    )
    for lvl, (mn, mx) in enumerate(zip(mins, maxs)):
        base = p >> lvl
        nodes = jax.lax.dynamic_update_slice(
            nodes, jnp.concatenate([mn, mx], axis=1), (base, 0)
        )
    return nodes


@functools.partial(jax.jit, static_argnames=("leaf_size", "num_tris"))
def _build_device(tri_verts: jax.Array, leaf_size: int, num_tris: int):
    """Device part of the build: morton sort + reduction.

    tri_verts is already padded to P*leaf_size with degenerate triangles at
    +INF (so they sort to the end and never intersect).
    """
    slots = tri_verts.shape[0]
    p = slots // leaf_size

    tmin = jnp.min(tri_verts, axis=1)
    tmax = jnp.max(tri_verts, axis=1)
    centroid = 0.5 * (tmin + tmax)
    real = jnp.arange(slots) < num_tris

    lo = jnp.min(jnp.where(real[:, None], centroid, INF), axis=0)
    hi = jnp.max(jnp.where(real[:, None], centroid, -INF), axis=0)
    codes = morton_codes(centroid, lo, hi)
    # force padding to the end regardless of its coordinates
    codes = jnp.where(real, codes, jnp.uint32(0xFFFFFFFF))

    order = jnp.argsort(codes)
    sorted_tris = tri_verts[order]
    perm = jnp.where(real[order], order.astype(jnp.int32), -1)

    smin = jnp.where((perm >= 0)[:, None], tmin[order], INF)
    smax = jnp.where((perm >= 0)[:, None], tmax[order], -INF)
    leaf_min = jnp.min(smin.reshape(p, leaf_size, 3), axis=1)
    leaf_max = jnp.max(smax.reshape(p, leaf_size, 3), axis=1)
    nodes = _reduce_levels(leaf_min, leaf_max)
    return nodes, sorted_tris, perm


def build_lbvh(tri_verts: jax.Array, leaf_size: int = 4) -> LBVH:
    """Build an LBVH over [T, 3, 3] triangles (BLAS-build analog)."""
    t = tri_verts.shape[0]
    p = _next_pow2(max(1, -(-t // leaf_size)))
    slots = p * leaf_size
    pad = slots - t
    if pad:
        tri_verts = jnp.concatenate(
            [tri_verts, jnp.full((pad, 3, 3), INF, tri_verts.dtype)], axis=0
        )
    nodes, sorted_tris, perm = _build_device(tri_verts, leaf_size, t)
    return LBVH(nodes=nodes, sorted_tris=sorted_tris, perm=perm)


@jax.jit
def refit_lbvh(bvh: LBVH, tri_verts_new: jax.Array) -> LBVH:
    """Refit with moved vertices, keeping ordering/topology
    (TLAS updateOnly analog, TopLevelASGenerator.cpp:240).

    tri_verts_new: [T, 3, 3] in ORIGINAL triangle order.
    """
    gathered = tri_verts_new[jnp.maximum(bvh.perm, 0)]
    pad = (bvh.perm < 0)[:, None, None]
    sorted_tris = jnp.where(pad, jnp.full_like(gathered, INF), gathered)
    p = bvh.num_leaves
    ls = bvh.leaf_size
    smin = jnp.where(pad[:, 0], INF, jnp.min(sorted_tris, axis=1))
    smax = jnp.where(pad[:, 0], -INF, jnp.max(sorted_tris, axis=1))
    nodes = _reduce_levels(
        jnp.min(smin.reshape(p, ls, 3), axis=1),
        jnp.max(smax.reshape(p, ls, 3), axis=1),
    )
    return bvh.replace(nodes=nodes, sorted_tris=sorted_tris)
