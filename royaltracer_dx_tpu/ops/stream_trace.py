"""Stream traversal: frustum-binned two-level acceleration, TPU-native.

The DXR TraceRay replacement (RayGen_v6_pass1.hlsl:99 dispatching into the
driver BVH built at BottomLevelASGenerator.cpp:235), designed from measured
TPU primitive costs rather than a GPU traversal port.  Measured constraints
that shaped it (BASELINE.md + this round's microbenchmarks):

  * per-lane pointer-chasing is impossible: row gathers are ~3-27 ns/row
    and a scalar-reduction chain inside a Pallas loop costs ~1-3 us per
    iteration;
  * Pallas grid steps cost ~1 us each, and a block DMA is only fast when
    it is ONE contiguous tile-aligned row (a [1,S,9,G] 4D slice = ~576
    strided 256 B transfers = 83 us/step — measured, round 2);
  * dense [128-ray x 128-tri] Moller-Trumbore is the one primitive the
    VPU runs near peak.

Structure (device-resident, refit-friendly):
  triangles --morton--> CLUSTERS of G=128 (tight AABBs)
            --group--->  BLOCKS of S=32 clusters (4k tris, flat 147 KB row)

Trace (one Pallas invocation per ray batch — no wave loop):
  1. Rays are grouped into chunks of 128 in caller order (use
     ``swizzle_order`` for pixel rays so a chunk is an 8x16 tile, the
     MapPixelID analog, Common_v6.hlsl:173-198).
  2. XLA: per-chunk interval bounds vs every block AABB (conservative
     frustum test), per-chunk near-to-far block worklist via one lane
     sort.  All dense, static-shaped.
  3. Pallas kernel, grid = chunks: double-buffered manual DMA streams the
     worklist blocks' flat triangle rows HBM->VMEM; per block the kernel
     runs an exact per-ray cluster slab ([128 x S]) and a statically
     unrolled per-cluster masked MT ([128 x G]) with lax.cond skipping
     clusters no ray wants; per-ray best-t culls as it tightens and the
     chunk exits when the next block's entry exceeds every live ray's
     bound.

Closest-hit visits blocks near-to-far and stops when the next entry is
beyond best-t; occlusion (ShadowRay.hlsl semantics) stops at any hit.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from royaltracer_dx_tpu.ops.bvh import morton_codes
from royaltracer_dx_tpu.ops.intersect import INF, Hit, as_planes3 as _as_planes3

G = 64          # triangles per cluster
S = 32          # clusters per block  (block = 2048 triangles)
RAYS_PER_CHUNK = 128   # pallas-kernel chunk; the XLA path uses TILE below
TILE = 64              # rays per tile in the XLA phase-B sweeps
ROW = 9 * G * S          # floats per flat block row (36864 = 147 KB)
_DET_EPS = 1e-12
_BIG = 3.0e38
_ONEHOT_MAX_CLUSTERS = 512   # sweep row-fetch via one-hot MXU matmul below
                             # this table size (~32k tris); gathers above


@flax.struct.dataclass
class StreamAccel:
    """Two-level stream-traversal structure (device arrays).

    Block b, cluster s, lane g address sorted-triangle slot
    (b*S + s)*G + g; ``perm`` maps slots to original triangle ids (-1 for
    padding — padded triangles are degenerate and never intersect).
    """

    blk_tris: jax.Array   # [B, 9S, G] v0/e1/e2 planes: cluster-major,
                          # plane-major, G lanes; one contiguous 147 KB
                          # row per block, every kernel read a [1, G]
                          # sublane slice at lane offset 0 (Mosaic cannot
                          # broadcast lane-offset or narrow vectors)
    blk_boxes: jax.Array  # [B, 6, 128] cluster AABB planes (lo.xyz |
                          # hi.xyz over S lanes; lanes >= S never hit)
    top_lo: jax.Array     # [B, 3] block AABBs
    top_hi: jax.Array     # [B, 3]
    perm: jax.Array       # [B*S*G] int32
    blk_boxes_bf16: jax.Array  # [B, 11S] outward-rounded bf16 cluster box
                               # + plane-slab rows (lo.xyz|hi.xyz|n.xyz|c|h
                               # groups) — fetched per (chunk, block) pair
                               # by one-hot matmul; conservative, so
                               # culling stays exact
    blk_planes: jax.Array  # [B, 5, 128] cluster thick-plane slabs
                           # (n.xyz | c | h over S lanes): |n.p - c| <= h
                           # bounds every cluster vertex; h < 0 on padding
                           # lanes (never crossed).  Near-planar clusters
                           # (heightfield patches, walls) have AABBs much
                           # fatter than their geometry, and the crossing
                           # test retires grazing rays/segments the box
                           # test cannot (round 4; conservative => exact)
    top_planes: jax.Array  # [B, 5] block-level thick-plane slabs

    @property
    def cl_flat(self) -> jax.Array:
        """[C, 9G] flat per-cluster triangle-plane rows (view)."""
        b = self.blk_tris.shape[0]
        return self.blk_tris.reshape(b * S, 9 * G)

    @property
    def num_blocks(self) -> int:
        return self.blk_tris.shape[0]


# ------------------------------- build ----------------------------------


@functools.partial(jax.jit, static_argnames=("num_tris",))
def _build_device(tri_padded: jax.Array, num_tris: int):
    """Morton order + reshape-reduce AABBs; tri_padded is [B*S*G, 3, 3]."""
    slots = tri_padded.shape[0]
    b = slots // (S * G)
    centroid = tri_padded.mean(axis=1)
    real = jnp.arange(slots) < num_tris
    lo = jnp.min(jnp.where(real[:, None], centroid, INF), axis=0)
    hi = jnp.max(jnp.where(real[:, None], centroid, -INF), axis=0)
    codes = morton_codes(centroid, lo, hi)
    codes = jnp.where(real, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes)
    sorted_tris = tri_padded[order]
    perm = jnp.where(real[order], order.astype(jnp.int32), -1)
    return _layout_device(sorted_tris, perm, b)


def _layout_device(sorted_tris: jax.Array, perm: jax.Array, b: int):
    """Flat-row layout from sorted triangles (shared by build + refit)."""
    pad = perm < 0
    # degenerate (all-zero) padding never passes the MT determinant test
    tv = jnp.where(pad[:, None, None], 0.0, sorted_tris)
    v0 = tv[:, 0]
    e1 = tv[:, 1] - tv[:, 0]
    e2 = tv[:, 2] - tv[:, 0]
    planes = jnp.concatenate([v0, e1, e2], axis=1)            # [slots, 9]
    # [b, S, G, 9] -> cluster-major, plane-major, G lanes
    blk_tris = (
        planes.reshape(b, S, G, 9).transpose(0, 1, 3, 2).reshape(b, 9 * S, G)
    )
    tmin = jnp.where(pad[:, None], _BIG, jnp.min(tv, axis=1))
    tmax = jnp.where(pad[:, None], -_BIG, jnp.max(tv, axis=1))
    cl_lo = jnp.min(tmin.reshape(b, S, G, 3), axis=2)         # [b, S, 3]
    cl_hi = jnp.max(tmax.reshape(b, S, G, 3), axis=2)
    # empty (all-padding) clusters/blocks collapse to the degenerate far
    # point [+BIG, +BIG]: an INVERTED box (lo=+BIG, hi=-BIG) spuriously
    # PASSES the interval/slab tests (its corner products are +/-inf on
    # both sides, leaving the slab unconstrained), which made every pad
    # cluster of the power-of-two device build a live candidate
    real_cl = jnp.any((perm >= 0).reshape(b, S, G), axis=2)
    cl_lo = jnp.where(real_cl[..., None], cl_lo, _BIG)
    cl_hi = jnp.where(real_cl[..., None], cl_hi, _BIG)
    def grp(a, fill):
        return jnp.pad(a, ((0, 0), (0, 128 - S)), constant_values=fill)

    groups = [grp(cl_lo[:, :, 0], _BIG), grp(cl_lo[:, :, 1], _BIG),
              grp(cl_lo[:, :, 2], _BIG), grp(cl_hi[:, :, 0], _BIG),
              grp(cl_hi[:, :, 1], _BIG), grp(cl_hi[:, :, 2], _BIG)]
    blk_boxes = jnp.stack(groups, axis=1)                     # [b, 6, 128]
    real_blk = jnp.any(real_cl, axis=1)
    top_lo = jnp.min(jnp.where(real_cl[..., None], cl_lo, _BIG), axis=1)
    top_hi = jnp.max(jnp.where(real_cl[..., None], cl_hi, -_BIG), axis=1)
    top_hi = jnp.where(real_blk[:, None], top_hi, _BIG)

    def out_lo(x):  # outward (down) bf16 rounding: 2^-8 relative margin
        return (x - jnp.abs(x) * 0.008 - 1e-30).astype(jnp.bfloat16)

    def out_hi(x):
        return (x + jnp.abs(x) * 0.008 + 1e-30).astype(jnp.bfloat16)

    def bf16_rne_f32(x):
        """Round f32 to the nearest bf16 value, returned AS f32 — done in
        integer space because XLA's excess-precision pass (on by default
        on TPU) elides a convert(f32->bf16->f32) pair, which silently
        left n/c UNROUNDED here while the bf16 rows stored the rounded
        values: h was then exact for a plane the runtime never tested
        and the bf16 slab cull turned non-conservative (round-4 bug,
        caught by the r4v order-dependence check)."""
        u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
        r = (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))) \
            & jnp.uint32(0xFFFF0000)
        return jax.lax.bitcast_convert_type(r, jnp.float32)

    # --- thick-plane slabs.  n = the cluster's area-weighted mean
    # triangle normal (sum of cross(e1, e2)), ROUNDED TO BF16 FIRST so
    # both storage precisions test the same plane; c/h = center and
    # half-extent of the vertex projections onto that n, computed in f32
    # AGAINST the rounded n (so h is exact for the plane actually
    # tested), then inflated for runtime fp error.  Degenerate clusters
    # (folded geometry whose normals cancel) get n ~ 0 => every
    # projection ~ 0 => the crossing test passes for every ray, i.e. the
    # slab gracefully degrades to a no-op; padding clusters get h < 0
    # (never crossed — their boxes already never pass).
    nrm = jnp.cross(e1, e2)                                  # [slots, 3]
    nsum = jnp.sum(jnp.where(pad[:, None], 0.0, nrm).reshape(b, S, G, 3),
                   axis=2)                                   # [b, S, 3]
    nlen = jnp.sqrt(jnp.sum(nsum * nsum, axis=-1, keepdims=True))
    n_f = bf16_rne_f32(nsum / jnp.maximum(nlen, 1e-30))
    n_pl = n_f.astype(jnp.bfloat16)          # exact: already a bf16 value
    vtx = tv.reshape(b, S, G, 3, 3)                          # verts, xyz
    dproj = sum(vtx[..., c] * n_f[:, :, None, None, c] for c in range(3))
    pad_v = pad.reshape(b, S, G)[..., None]                  # [b, S, G, 1]
    dmin = jnp.min(jnp.where(pad_v, _BIG, dproj), axis=(2, 3))
    dmax = jnp.max(jnp.where(pad_v, -_BIG, dproj), axis=(2, 3))
    c_f = bf16_rne_f32(0.5 * (dmin + dmax))
    c_pl = c_f.astype(jnp.bfloat16)          # exact: already a bf16 value
    h_pl = (jnp.maximum(dmax - c_f, c_f - dmin)
            + jnp.maximum(jnp.abs(dmin), jnp.abs(dmax)) * 1e-5 + 1e-30)
    h_pl = jnp.where(real_cl, h_pl, -_BIG)
    planes5 = [n_f[:, :, 0], n_f[:, :, 1], n_f[:, :, 2], c_f, h_pl]
    blk_planes = jnp.stack([grp(p, 0.0) for p in planes5[:4]]
                           + [grp(h_pl, -_BIG)], axis=1)     # [b, 5, 128]

    # block-level slab over the whole 2048-tri block
    bn = jnp.sum(jnp.where(pad[:, None], 0.0, nrm).reshape(b, S * G, 3),
                 axis=1)
    bnlen = jnp.sqrt(jnp.sum(bn * bn, axis=-1, keepdims=True))
    bn_f = bf16_rne_f32(bn / jnp.maximum(bnlen, 1e-30))      # [b, 3]
    bproj = sum(tv.reshape(b, S * G, 3, 3)[..., c] * bn_f[:, None, None, c]
                for c in range(3))
    bpad = pad.reshape(b, S * G)[..., None]
    bdmin = jnp.min(jnp.where(bpad, _BIG, bproj), axis=(1, 2))
    bdmax = jnp.max(jnp.where(bpad, -_BIG, bproj), axis=(1, 2))
    bc = bf16_rne_f32(0.5 * (bdmin + bdmax))
    bh = (jnp.maximum(bdmax - bc, bc - bdmin)
          + jnp.maximum(jnp.abs(bdmin), jnp.abs(bdmax)) * 1e-5 + 1e-30)
    bh = jnp.where(real_blk, bh, -_BIG)
    top_planes = jnp.stack([bn_f[:, 0], bn_f[:, 1], bn_f[:, 2], bc, bh],
                           axis=1)                           # [b, 5]

    def up_bf16(x):  # upward bf16 rounding for the slab half-widths
        return jnp.where(x < 0.0, x,
                         x + jnp.abs(x) * 0.008 + 1e-30).astype(jnp.bfloat16)

    bf = jnp.concatenate(
        [out_lo(cl_lo[:, :, 0]), out_lo(cl_lo[:, :, 1]), out_lo(cl_lo[:, :, 2]),
         out_hi(cl_hi[:, :, 0]), out_hi(cl_hi[:, :, 1]), out_hi(cl_hi[:, :, 2]),
         n_pl[:, :, 0], n_pl[:, :, 1], n_pl[:, :, 2], c_pl,
         up_bf16(h_pl)],
        axis=1)                                              # [b, 11S]
    return StreamAccel(
        blk_tris=blk_tris, blk_boxes=blk_boxes,
        top_lo=top_lo, top_hi=top_hi, perm=perm, blk_boxes_bf16=bf,
        blk_planes=blk_planes, top_planes=top_planes,
    )


def _median_perm_device(centroid: jax.Array, tri_id: jax.Array):
    """Equal-split recursive median ordering, fully on device.

    The BLAS quality-build analog (BottomLevelASGenerator.cpp:235) without
    the host recursion: ``centroid`` is padded to a power-of-two length P
    (padding = +INF), and each level sorts every segment by its widest
    centroid axis with ONE flat stable two-key lax.sort (segment id, then
    normalized axis value).  Segment ids come from an iota (elements stay
    contiguous per segment), per-segment extents from equal-length
    reshapes — no scatters, no per-lane gathers, ~log2(P/G) sorts total.
    Padding sorts to each segment's tail (key +INF) and stays degenerate.

    Returns tri ids in median order ([P] int32, pad slots hold -1).
    """
    p = centroid.shape[0]
    levels = max(0, (p // G).bit_length() - 1)
    cx, cy, cz = centroid[:, 0], centroid[:, 1], centroid[:, 2]
    tid = tri_id
    for lvl in range(levels):
        nseg = 1 << lvl
        seglen = p >> lvl
        segid = jax.lax.iota(jnp.int32, p) >> (seglen.bit_length() - 1)

        def ext(c):
            cc = c.reshape(nseg, seglen)
            fin = cc < _BIG
            lo = jnp.min(jnp.where(fin, cc, _BIG), axis=1)
            hi = jnp.max(jnp.where(fin, cc, -_BIG), axis=1)
            return lo, hi

        xlo, xhi = ext(cx)
        ylo, yhi = ext(cy)
        zlo, zhi = ext(cz)
        ex, ey, ez = xhi - xlo, yhi - ylo, zhi - zlo

        def expand(a):  # [nseg] -> [P] without gathers
            return jnp.broadcast_to(a[:, None], (nseg, seglen)).reshape(p)

        use_y = (ey >= ex) & (ey >= ez)
        use_z = (ez > ex) & (ez > ey) & ~use_y
        val = jnp.where(expand(use_y), cy, jnp.where(expand(use_z), cz, cx))
        lo_e = jnp.where(expand(use_y), expand(ylo),
                         jnp.where(expand(use_z), expand(zlo), expand(xlo)))
        hi_e = jnp.where(expand(use_y), expand(yhi),
                         jnp.where(expand(use_z), expand(zhi), expand(xhi)))
        frac = (val - lo_e) / jnp.maximum(hi_e - lo_e, 1e-30)
        frac = jnp.where(val < _BIG, frac, INF)
        _, _, cx, cy, cz, tid = jax.lax.sort(
            (segid, frac, cx, cy, cz, tid), dimension=0, num_keys=2,
            is_stable=True)
    return tid


@functools.partial(jax.jit, static_argnames=("num_tris",))
def _build_device_median(tri_padded: jax.Array, num_tris: int):
    """Device quality build: median ordering + flat-row layout.

    tri_padded is [P, 3, 3] with P a power of two >= max(num_tris, S*G);
    ~log2(P/64) flat sorts + one triangle gather (same cost class as the
    per-frame refit).  Replaces the 10-minute host recursion at 1M tris.
    """
    p = tri_padded.shape[0]
    centroid = tri_padded.mean(axis=1)
    real = jnp.arange(p) < num_tris
    centroid = jnp.where(real[:, None], centroid, INF)
    tid = jnp.where(real, jax.lax.iota(jnp.int32, p), -1)
    order = _median_perm_device(centroid, tid)
    sorted_tris = jnp.where(
        (order >= 0)[:, None, None], tri_padded[jnp.maximum(order, 0)], 0.0)
    return _layout_device(sorted_tris, order, p // (S * G))


def _median_split_perm(centroids, gran_leaf: int, gran_block: int):
    """Equal-count recursive median split along the widest centroid axis.

    Returns an int32 permutation ordering triangles so that contiguous
    runs of ``gran_leaf`` form tight clusters and runs of ``gran_block``
    form tight blocks (split granularity switches once a segment fits in
    a block).  Host-side numpy — the structural analog of the driver's
    BLAS build; per-frame refit stays on device.
    """
    import numpy as np

    c = np.asarray(centroids)
    n = c.shape[0]
    perm = np.arange(n, dtype=np.int64)
    stack = [(0, n)]
    out = []
    while stack:
        lo, hi = stack.pop()
        count = hi - lo
        if count <= gran_leaf:
            out.append((lo, hi))
            continue
        gran = gran_block if count > gran_block else gran_leaf
        seg = perm[lo:hi]
        ext = c[seg].max(axis=0) - c[seg].min(axis=0)
        axis = int(np.argmax(ext))
        order = np.argsort(c[seg, axis], kind="stable")
        perm[lo:hi] = seg[order]
        half = count // 2
        left = max(gran, (half // gran) * gran)
        if left >= count:
            left = count - gran
        stack.append((lo, lo + left))
        stack.append((lo + left, hi))
    return perm.astype(np.int32)


def build_stream_accel(tri_verts: jax.Array, method: str = "median") -> StreamAccel:
    """Build over [T, 3, 3] world-space triangles (BLAS-build analog).

    method='median' (default): DEVICE equal-split median ordering — the
    quality build, ~log2(T/64) flat sorts, sub-second at 1M tris (the
    round-2 host recursion took minutes; kept as 'median_host' for
    comparison).  method='morton': on-device morton ordering (cheapest).
    Refit (refit_stream_accel) is device-only for every method.
    """
    t = tri_verts.shape[0]
    blk = S * G
    if method == "median":
        p = max(blk, 1 << (t - 1).bit_length())
        pad = p - t
        if pad:
            tri_verts = jnp.concatenate(
                [tri_verts, jnp.zeros((pad, 3, 3), tri_verts.dtype)], axis=0)
        return _build_device_median(tri_verts, t)
    b = max(1, -(-t // blk))
    pad = b * blk - t
    if pad:
        tri_verts = jnp.concatenate(
            [tri_verts, jnp.full((pad, 3, 3), INF, tri_verts.dtype)], axis=0
        )
    if method == "morton":
        return _build_device(tri_verts, t)
    import numpy as np

    tv = np.asarray(tri_verts[:t])
    centroids = tv.mean(axis=1)
    order = _median_split_perm(centroids, G, S * G)
    perm = np.full(b * blk, -1, np.int32)
    perm[:t] = order
    sorted_tris = jnp.asarray(
        np.concatenate([tv[order],
                        np.zeros((pad, 3, 3), np.float32)], axis=0))
    return _layout_device(sorted_tris, jnp.asarray(perm), b)


@jax.jit
def refit_stream_accel(accel: StreamAccel, tri_verts_new: jax.Array) -> StreamAccel:
    """Refit with moved vertices, keeping the morton ordering/topology —
    the TLAS updateOnly analog (TopLevelASGenerator.cpp:240, called per
    frame at Renderer.cpp:594).  Pure device work, no host loops.
    """
    gathered = tri_verts_new[jnp.maximum(accel.perm, 0)]
    return _layout_device(gathered, accel.perm, accel.num_blocks)


# --------------------------- chunk worklists -----------------------------


def swizzle_order(width: int, height: int, tile_w: int = 16, tile_h: int = 8):
    """Pixel index permutation making each 128-ray chunk an 8x16 tile.

    The MapPixelID analog (Common_v6.hlsl:173-198): the reference swizzles
    pixels into 4x4 GPU tiles; here chunks become compact pixel rectangles
    so the per-chunk frustum used for block culling stays tight.  Returns
    (order, inverse) int32 numpy arrays of length width*height; apply as
    ``rays[order]``, undo as ``result[inverse]``.
    """
    import numpy as np

    assert width % tile_w == 0 and height % tile_h == 0
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    tile_id = (ys // tile_h) * (width // tile_w) + (xs // tile_w)
    in_tile = (ys % tile_h) * tile_w + (xs % tile_w)
    key = tile_id.astype(np.int64) * (tile_w * tile_h) + in_tile
    order = np.argsort(key.ravel(), kind="stable").astype(np.int32)
    inverse = np.argsort(order, kind="stable").astype(np.int32)
    return order, inverse


def _interval_slab(o_lo, o_hi, d_lo, d_hi, lo, hi, t_lo, t_hi):
    """Conservative chunk-frustum vs AABB overlap via interval arithmetic.

    o_*/d_*: [chunks, 3] per-chunk ray bounds; lo/hi: [X, 3] boxes;
    t_lo/t_hi: [chunks] ray-range bounds.  Returns (pass [chunks, X],
    entry_lb [chunks, X]) — pass is a superset of any member ray's exact
    slab result, entry_lb a lower bound on any member ray's entry.
    """
    chunks = o_lo.shape[0]
    x = lo.shape[0]
    tn = jnp.broadcast_to(t_lo[:, None], (chunks, x))
    tf = jnp.broadcast_to(t_hi[:, None], (chunks, x))
    for c in range(3):
        dl = d_lo[:, c:c + 1]
        dh = d_hi[:, c:c + 1]
        unconstrained = (dl <= 0.0) & (dh >= 0.0)
        il = jnp.where(unconstrained, 1.0,
                       1.0 / jnp.where(dh == 0.0, 1.0, dh))
        ih = jnp.where(unconstrained, 1.0,
                       1.0 / jnp.where(dl == 0.0, 1.0, dl))
        a1 = lo[None, :, c] - o_hi[:, c:c + 1]
        a2 = lo[None, :, c] - o_lo[:, c:c + 1]
        b1 = hi[None, :, c] - o_hi[:, c:c + 1]
        b2 = hi[None, :, c] - o_lo[:, c:c + 1]
        p_min = jnp.minimum(
            jnp.minimum(jnp.minimum(a1 * il, a1 * ih),
                        jnp.minimum(a2 * il, a2 * ih)),
            jnp.minimum(jnp.minimum(b1 * il, b1 * ih),
                        jnp.minimum(b2 * il, b2 * ih)))
        p_max = jnp.maximum(
            jnp.maximum(jnp.maximum(a1 * il, a1 * ih),
                        jnp.maximum(a2 * il, a2 * ih)),
            jnp.maximum(jnp.maximum(b1 * il, b1 * ih),
                        jnp.maximum(b2 * il, b2 * ih)))
        near = jnp.where(unconstrained, -_BIG, p_min)
        far = jnp.where(unconstrained, _BIG, p_max)
        tn = jnp.maximum(tn, near)
        tf = jnp.minimum(tf, far)
    return tn <= tf, jnp.maximum(tn, 0.0)


def _build_worklists(origins, dirs, t_min, t_max, accel, wb: int):
    """Per-chunk near-to-far block worklists.

    Returns (wl [chunks, wb] i32 block ids, went [chunks, wb] f32 entry
    lower bounds, cnt [chunks, 1] i32, overflow [] bool).
    """
    n = origins.shape[0]
    chunks = n // RAYS_PER_CHUNK
    b = accel.num_blocks

    def bounds(a):
        a = a.reshape(chunks, RAYS_PER_CHUNK, 3)
        return a.min(axis=1), a.max(axis=1)

    o_lo, o_hi = bounds(origins)
    d_lo, d_hi = bounds(dirs)
    t_lo = t_min.reshape(chunks, RAYS_PER_CHUNK).min(axis=1)
    t_hi = t_max.reshape(chunks, RAYS_PER_CHUNK).max(axis=1)

    ok, entry = _interval_slab(
        o_lo, o_hi, d_lo, d_hi, accel.top_lo, accel.top_hi, t_lo, t_hi)
    key = jnp.where(ok, entry, INF)
    bid = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[None, :], key.shape)
    skey, sbid = jax.lax.sort((key, bid), dimension=1, num_keys=1)
    if b < wb:
        skey = jnp.pad(skey, ((0, 0), (0, wb - b)), constant_values=INF)
        sbid = jnp.pad(sbid, ((0, 0), (0, wb - b)))
    wl = sbid[:, :wb]
    went = skey[:, :wb]
    cnt_true = jnp.sum(ok.astype(jnp.int32), axis=1)
    cnt = jnp.minimum(cnt_true, wb)[:, None]
    overflow = jnp.any(cnt_true > wb)
    return wl, went, cnt, overflow


# ----------------------------- Pallas kernel ----------------------------


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _make_kernel(occlusion: bool, wb: int):
    """Per-chunk kernel: stream worklist blocks, exact per-ray tests.

    Rows [128, 16]: o.xyz d.xyz t_min t_cur valid pad7.  Out [128, 8]:
    t u v slot(float, -1 = none) pad4; occlusion encodes a hit as t=0.
    """

    def kernel(wl_ref, went_ref, cnt_ref, rows_ref, tris_hbm, boxes_hbm,
               out_ref, buf_t, buf_b, st, sem_t, sem_b):
        rows = rows_ref[:]                       # [128, 16]
        o = [rows[:, c:c + 1] for c in range(3)]
        d = [rows[:, 3 + c:4 + c] for c in range(3)]
        inv = [_safe_inv(c) for c in d]
        oi = [o[c] * inv[c] for c in range(3)]
        t_min = rows[:, 6:7]
        tcur = rows[:, 7:8]
        valid = rows[:, 8:9] > 0.5
        cnt = cnt_ref[0, 0, 0]

        def tdma(w, slot):
            return pltpu.make_async_copy(
                tris_hbm.at[wl_ref[0, 0, w]], buf_t.at[slot],
                sem_t.at[slot])

        def bdma(w, slot):
            return pltpu.make_async_copy(
                boxes_hbm.at[wl_ref[0, 0, w]], buf_b.at[slot],
                sem_b.at[slot])

        @pl.when(cnt > 0)
        def _():
            tdma(0, 0).start()
            bdma(0, 0).start()

        lane_gf = jax.lax.broadcasted_iota(
            jnp.int32, (RAYS_PER_CHUNK, G), 1).astype(jnp.float32)

        # per-ray running state lives in scratch (st persists across grid
        # steps -> re-init each step): t | tri | u | v
        st[:, 0:1] = tcur * 1.0
        st[:, 1:2] = jnp.zeros((RAYS_PER_CHUNK, 1), jnp.float32) - 1.0
        st[:, 2:4] = jnp.zeros((RAYS_PER_CHUNK, 2), jnp.float32)

        def block_body(state):
            w, bound_prev, ncl = state
            slot = jax.lax.rem(w, jnp.int32(2))

            @pl.when(w + 1 < cnt)
            def _():
                nslot = jax.lax.rem(w + 1, jnp.int32(2))
                tdma(w + 1, nslot).start()
                bdma(w + 1, nslot).start()

            tdma(w, slot).wait()
            bdma(w, slot).wait()

            tbest0 = st[:, 0:1]
            bb = buf_b[slot]                     # [6, 128]
            tn = jnp.broadcast_to(t_min, (RAYS_PER_CHUNK, 128))
            tf = jnp.broadcast_to(tbest0, (RAYS_PER_CHUNK, 128))
            for c in range(3):
                blo = bb[c:c + 1, :]
                bhi = bb[3 + c:4 + c, :]
                t0 = blo * inv[c] - oi[c]
                t1 = bhi * inv[c] - oi[c]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            cand = (tn <= tf) & valid            # [128, 128]
            hot_cl = jnp.sum(cand.astype(jnp.int32), axis=0,
                             keepdims=True)      # [1, 128]

            bt = buf_t[slot]                     # [9S, G]
            bid_f = wl_ref[0, 0, w].astype(jnp.float32)

            def cluster(s):
                tbest = st[:, 0:1]
                p = [bt[s * 9 + k: s * 9 + k + 1, :] for k in range(9)]
                v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = p
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
                uu = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = (
                    (jnp.abs(det) > _DET_EPS)
                    & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt > t_min) & (tt < tbest)
                    & cand[:, s:s + 1]
                )
                tt = jnp.where(ok, tt, _BIG)
                if occlusion:
                    hit = jnp.any(tt < _BIG, axis=1, keepdims=True)
                    st[:, 0:1] = jnp.where(hit, 0.0, tbest)
                    return
                t_c = jnp.min(tt, axis=1, keepdims=True)
                idx = jnp.min(jnp.where(tt <= t_c, lane_gf, float(G)),
                              axis=1, keepdims=True)  # first-min lane
                hot = lane_gf == idx
                u_c = jnp.sum(jnp.where(hot, uu, 0.0), axis=1, keepdims=True)
                v_c = jnp.sum(jnp.where(hot, vv, 0.0), axis=1, keepdims=True)
                better = t_c < tbest
                slotf = (bid_f * S + s) * G + idx
                st[:, 0:1] = jnp.where(better, t_c, tbest)
                st[:, 1:2] = jnp.where(better, slotf, st[:, 1:2])
                st[:, 2:3] = jnp.where(better, u_c, st[:, 2:3])
                st[:, 3:4] = jnp.where(better, v_c, st[:, 3:4])

            for s in range(S):                   # static unroll, when-skip
                pl.when(hot_cl[0, s] > 0)(functools.partial(cluster, s))
            ncl_blk = jnp.sum((hot_cl > 0).astype(jnp.int32))

            tbest = st[:, 0:1]
            if occlusion:
                bound = jnp.where(jnp.any(valid & (tbest > 0.0)), 1.0, -_BIG)
            else:
                bound = jnp.max(jnp.where(valid, tbest, 0.0))
            return w + 1, bound, ncl + ncl_blk

        def cond(state):
            w, bound, ncl = state
            if occlusion:
                more = bound > 0.0
            else:
                more = went_ref[0, 0, jnp.minimum(w, wb - 1)] < bound
            return (w < cnt) & more

        if occlusion:
            bound0 = jnp.where(jnp.any(valid), 1.0, -_BIG)
        else:
            bound0 = jnp.max(jnp.where(valid, tcur, 0.0))
        w_fin, _, ncl_fin = jax.lax.while_loop(
            cond, block_body, (jnp.int32(0), bound0, jnp.int32(0)))
        tbest = st[:, 0:1]
        tri = st[:, 1:2]
        u = st[:, 2:3]
        v = st[:, 3:4]

        # drain: on (early) exit at w_fin, DMA pair w_fin is in flight
        # (started by the warm-up or by body(w_fin - 1)) and must be
        # waited before the next grid step reuses the semaphores
        @pl.when(w_fin < cnt)
        def _():
            fslot = jax.lax.rem(w_fin, jnp.int32(2))
            tdma(w_fin, fslot).wait()
            bdma(w_fin, fslot).wait()

        if occlusion:
            improved = tbest <= 0.0
            tri = jnp.ones_like(tri)   # marker: col 3 >= 0 means occluded
        else:
            improved = tbest < tcur
        out_ref[:, 0:1] = tbest
        out_ref[:, 1:2] = u
        out_ref[:, 2:3] = v
        # slot id rides as a float VALUE (exact < 2^24; bitcast ints are
        # denormal-flushed on TPU)
        out_ref[:, 3:4] = jnp.where(improved, tri, -1.0)
        # debug/metrics: blocks visited + clusters MT'd by this chunk
        out_ref[:, 4:5] = jnp.zeros(
            (RAYS_PER_CHUNK, 1), jnp.float32) + w_fin.astype(jnp.float32)
        out_ref[:, 5:6] = jnp.zeros(
            (RAYS_PER_CHUNK, 1), jnp.float32) + ncl_fin.astype(jnp.float32)
        out_ref[:, 6:8] = jnp.zeros((RAYS_PER_CHUNK, 2), jnp.float32)

    return kernel


def _safe_inv(d):
    big = jnp.where(d >= 0.0, 1e30, -1e30)
    return jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, big)


def _run_kernel(wl, went, cnt, rows, accel, occlusion: bool, wb: int):
    chunks = wl.shape[0]
    n_pad = rows.shape[0]
    return pl.pallas_call(
        _make_kernel(occlusion, wb),
        grid=(chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RAYS_PER_CHUNK, 16), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((RAYS_PER_CHUNK, 8), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 9 * S, G), jnp.float32),
            pltpu.VMEM((2, 6, 128), jnp.float32),
            pltpu.VMEM((RAYS_PER_CHUNK, 4), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(wl[:, None, :], went[:, None, :], cnt[:, :, None],
      rows, accel.blk_tris, accel.blk_boxes)


# ------------------------------- tracing --------------------------------


@functools.partial(jax.jit, static_argnames=("occlusion", "wb"))
def _trace_stream(origins, dirs, accel: StreamAccel, t_min, t_max,
                  occlusion: bool, wb: int):
    n = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    n_pad = -(-n // RAYS_PER_CHUNK) * RAYS_PER_CHUNK
    pad = n_pad - n

    def padr(a, v=0.0):
        if pad == 0:
            return a
        w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, w, constant_values=v)

    op = padr(origins)
    dp = padr(dirs, 1.0)
    tminp = padr(t_min)
    tmaxp = padr(t_max, -1.0)
    validp = padr(jnp.ones((n,), jnp.float32))

    # worklist sized to cover EVERY block (>= num_blocks): a chunk frustum
    # can never overflow it, so no hits are ever silently dropped (the
    # round-2 wb cap + last_overflow attribute was unobservable from jit
    # and could lose hits on large scenes — ADVICE r2)
    wb_eff = max(wb, accel.num_blocks)
    wl, went, cnt, overflow = _build_worklists(op, dp, tminp, tmaxp,
                                               accel, wb_eff)
    rows = jnp.concatenate(
        [op, dp, tminp[:, None], tmaxp[:, None], validp[:, None],
         jnp.zeros((n_pad, 7), jnp.float32)], axis=1)
    res = _run_kernel(wl, went, cnt, rows, accel, occlusion, wb_eff)
    return res[:n]


def closest_hit_stream(origins, dirs, accel: StreamAccel,
                       t_min=1e-4, t_max=1e4, wb: int = 64) -> Hit:
    """Closest hit of [N, 3] rays via the stream traversal (Pallas path).

    The per-chunk block worklist is sized to max(wb, num_blocks), so
    coverage is always complete.
    """
    best = _trace_stream(origins, dirs, accel, t_min, t_max, False, wb)
    slot = best[:, 3].astype(jnp.int32)
    found = slot >= 0
    orig = jnp.where(found, accel.perm[jnp.maximum(slot, 0)], 0)
    return Hit(
        t=jnp.where(found, best[:, 0], INF),
        tri=orig.astype(jnp.int32),
        u=best[:, 1],
        v=best[:, 2],
    )


def any_hit_stream(origins, dirs, accel: StreamAccel,
                   t_min, t_max, wb: int = 64) -> jax.Array:
    """Boolean occlusion query (ShadowRay.hlsl semantics).

    Caller-masked rays (t_max <= t_min, e.g. dead shadow lanes) are never
    occluded — the kernel's t=0 encoding also matches their initial state,
    so the liveness mask here is what distinguishes them (ADVICE r2)."""
    best = _trace_stream(origins, dirs, accel, t_min, t_max, True, wb)
    n = best.shape[0]
    live = (jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
            > jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,)))
    return (best[:, 3] >= 0.0) & live


# --------------------------- XLA trace path ------------------------------
#
# Measured on this host (round 2): Pallas custom-call kernels execute ~1000x
# below hardware speed through the axon tunnel (one 4 MB DMA pair = 96 ms =
# 0.09 GB/s; a trivial in-kernel fori iteration = 14 us), while XLA ops run
# at full device speed (bf16 matmul 101 TFLOP/s, 1D sorts ~1 G elt/s).  The
# default trace path below is therefore pure XLA; the Pallas kernel above is
# the deployment design for environments with native Pallas execution.


def _segment_sizes(tiles: int, factor: int = 4) -> list:
    sizes = [tiles]
    while sizes[-1] > factor:
        sizes.append(max(1, sizes[-1] // factor))
    return sizes


def _block_sort(origins, dirs, t_min, t_max, accel: StreamAccel,
                rays=None):
    """Per-tile near-to-far block ordering (computed once per trace).

    Rays with t_max <= t_min (masked/padding rays) are excluded from the
    tile interval bounds so dead lanes don't fatten the frustum.  With
    ``rays`` (tile-layout planes) every interval-passing block is
    additionally slab-tested per RAY — decisive for long-segment batches
    (a shadow tile toward a distant light is a 30-unit tube whose
    interval test passes half the block list; the exact union is a
    handful — r3p measured the skylight occlusion at 53.8 ms interval-
    only), and bit-identical by the conservative-superset argument.
    origins/dirs: 3-tuples of [N] component planes.
    Returns (sbid [tiles, B] i32, skey [tiles, B] f32 entry lbs with INF
    for non-overlap, bcnt [tiles], tile interval bounds)."""
    n = origins[0].shape[0]
    tiles = n // TILE
    b = accel.num_blocks
    live = (t_max > t_min).reshape(tiles, TILE)

    def bounds(cols):
        a = [c.reshape(tiles, TILE) for c in cols]
        return (jnp.stack([jnp.min(jnp.where(live, c, _BIG), axis=1)
                           for c in a], axis=-1),
                jnp.stack([jnp.max(jnp.where(live, c, -_BIG), axis=1)
                           for c in a], axis=-1))

    o_lo, o_hi = bounds(origins)
    d_lo, d_hi = bounds(dirs)
    t_lo = jnp.min(jnp.where(live,
                             t_min.reshape(tiles, TILE), _BIG), axis=1)
    t_hi = jnp.max(jnp.where(live,
                             t_max.reshape(tiles, TILE), -_BIG), axis=1)

    ok, entry = _interval_slab(
        o_lo, o_hi, d_lo, d_hi, accel.top_lo, accel.top_hi, t_lo, t_hi)
    if rays is not None:
        rpass, rentry = _per_ray_top_cull(rays, accel.top_lo, accel.top_hi,
                                          accel.top_planes)
        ok = ok & rpass
        entry = rentry
    key = jnp.where(ok, entry, INF)
    bid = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[None, :], key.shape)
    skey, sbid = jax.lax.sort((key, bid), dimension=1, num_keys=1)
    bcnt = jnp.sum(ok.astype(jnp.int32), axis=1)
    return sbid, skey, bcnt, (o_lo, o_hi, d_lo, d_hi, t_lo, t_hi)


def _per_ray_top_cull(rays, top_lo, top_hi, top_planes=None):
    """Exact per-ray slab vs every block AABB, reduced per tile.

    rays: tile-layout planes (3 x [tiles, R, 1], t_min/t_max
    [tiles, R, 1]); top_lo/top_hi [B, 3]; top_planes (optional, [B, 5]
    n.xyz|c|h) adds the conservative thick-plane crossing test (see
    _per_ray_box_cull).  Returns (pass [tiles, B], entry [tiles, B] —
    min slab entry over passing rays, INF where none).  Fuses into the
    two reductions like _per_ray_box_cull."""
    o, d, t_min_t, t_max_t = rays
    tiles = o[0].shape[0]
    b = top_lo.shape[0]
    live = t_max_t > t_min_t                              # [tiles, R, 1]
    tn = jnp.broadcast_to(t_min_t, t_min_t.shape[:2] + (b,))
    tf = jnp.broadcast_to(t_max_t, t_max_t.shape[:2] + (b,))
    for c in range(3):
        lo_c = top_lo[None, None, :, c]
        hi_c = top_hi[None, None, :, c]
        inv = _safe_inv(d[c])
        t0 = (lo_c - o[c]) * inv
        t1 = (hi_c - o[c]) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    ok = (tn <= tf) & live
    if top_planes is not None:
        pn = [top_planes[None, None, :, j] for j in range(3)]
        pc = top_planes[None, None, :, 3]
        ph = top_planes[None, None, :, 4]
        t0 = pn[0] * o[0]
        t1 = pn[1] * o[1]
        t2 = pn[2] * o[2]
        a = t0 + t1 + t2 - pc
        amag = jnp.abs(t0) + jnp.abs(t1) + jnp.abs(t2) + jnp.abs(pc)
        bb = pn[0] * d[0] + pn[1] * d[1] + pn[2] * d[2]
        d0 = a + tn * bb
        d1 = a + tf * bb
        thr = ph + 4e-6 * (amag
                           + jnp.maximum(jnp.abs(tn), jnp.abs(tf))
                           * jnp.abs(bb)) + 1e-25
        ok = ok & (jnp.minimum(d0, d1) <= thr) & (jnp.maximum(d0, d1) >= -thr)
    rpass = jnp.any(ok, axis=1)                           # [tiles, B]
    entry = jnp.min(jnp.where(ok, jnp.maximum(tn, 0.0), INF), axis=1)
    return rpass, entry


def _cluster_window(sbid, skey, tb, accel: StreamAccel, wb: int, w0: int,
                    rays=None):
    """Cluster worklist for blocks ranked [w0, w0+wb) per tile.

    One one-hot matmul fetches the outward-rounded bf16 cluster boxes of
    the window's blocks; an interval slab tests their S clusters; with
    ``rays`` (round 3) every surviving cluster is additionally slab-tested
    per RAY — the tile-interval test is very conservative, and the exact
    per-ray cull cuts candidates ~2-4x for ~0.5 ms (measured) — and the
    per-tile entry becomes the min entry over passing rays (tighter
    near-to-far ordering).  A lane sort orders candidates near-to-far.
    Returns (ccid [tiles, wb*S], centry [tiles, wb*S] f32 (INF pad),
    ccnt [tiles])."""
    tiles, bp = sbid.shape
    hi = min(w0 + wb, bp)
    wl = sbid[:, w0:hi]
    wok = skey[:, w0:hi] < INF
    if hi - w0 <= 0:
        z = jnp.zeros((tiles, 1), jnp.int32)
        return z, jnp.full((tiles, 1), INF), z[:, 0]
    return _cluster_window_wl(wl, wok, tb, accel, rays)


def _cluster_window_wl(wl, wok, tb, accel: StreamAccel, rays=None):
    """_cluster_window body over an already-sliced block window.

    wl [tiles, wbw] int32 block ids, wok [tiles, wbw] validity (False for
    non-overlapped / padding slots).  Shared by the static window-0 slice
    and the dynamic-offset tail-window loop of ``_trace_stream_xla``.
    ``tb`` (tile interval bounds) is only consumed when ``rays`` is None —
    pass None with per-ray culling."""
    tiles, wbw = wl.shape
    b = accel.num_blocks

    flat_bid = wl.reshape(tiles * wbw)
    oh = (flat_bid[:, None] ==
          jnp.arange(b, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    rows = jnp.dot(oh, accel.blk_boxes_bf16,
                   preferred_element_type=jnp.float32)    # [tiles*wbw, 11S]
    rows = rows.reshape(tiles, wbw, 11, S)
    boxes = rows[:, :, :6]
    planes = rows[:, :, 6:]
    if rays is not None:
        # The exact per-ray cull SUBSUMES the tile-interval slab: interval
        # arithmetic is conservative over member rays, so per-ray pass is
        # a subset of interval pass and the per-ray min entry >= the
        # interval entry — running the slab too would change nothing
        # (bit-identical cok/centry) while paying its batched math and
        # the [tiles, wbw, S, 3] moveaxis copies.
        rpass, rentry = _per_ray_box_cull(rays, boxes, planes)
        cok = rpass & jnp.repeat(wok, S, axis=1)
        centry = rentry
    else:
        o_lo, o_hi, d_lo, d_hi, t_lo, t_hi = tb
        cl_lo = jnp.moveaxis(boxes[:, :, 0:3, :], 2, 3)   # [tiles, wbw, S, 3]
        cl_hi = jnp.moveaxis(boxes[:, :, 3:6, :], 2, 3)
        cok, centry = _interval_slab_batched(
            o_lo, o_hi, d_lo, d_hi, cl_lo, cl_hi, t_lo, t_hi)
        cok = (cok & wok[:, :, None]).reshape(tiles, wbw * S)
        centry = centry.reshape(tiles, wbw * S)
    cid = (wl[:, :, None] * S
           + jnp.arange(S, dtype=jnp.int32)[None, None, :]
           ).reshape(tiles, wbw * S)
    ckey = jnp.where(cok, centry, INF)
    centry_s, ccid = _packed_sort(ckey, cid, accel.num_blocks * S)
    ccnt = jnp.sum(cok.astype(jnp.int32), axis=1)
    return ccid, centry_s, ccnt


def _packed_sort(ckey, cid, n_ids: int):
    """Near-to-far candidate ordering as ONE single-operand lane sort.

    A two-operand ``lax.sort((key f32, id i32))`` runs every bitonic
    compare-exchange pass on both arrays.  Keys here are nonnegative slab
    entries (IEEE order == int order when bitcast), and ids need only
    ``ceil(log2(n_ids))`` bits, so key and id pack into one int32: clear
    the key's low ``bits`` mantissa bits, OR the id in, sort the single
    int32 array, unmask.  Entry keys lose ``bits`` of mantissa, ROUNDED
    DOWN — they only drive near-to-far ordering and the sweep's
    early-exit bound ``nxt < best_t``, where rounding down is
    conservative (never exits early), so the trace stays exact.  INF
    padding survives: clearing low bits of 0x7f800000 is itself, so dead
    lanes still sort last and unpack to INF.  Falls back to the
    two-operand sort when ids need > 20 bits (keys would drop to < 3
    mantissa bits)."""
    bits = max(1, (max(2, n_ids) - 1).bit_length())
    if bits > 20:
        return jax.lax.sort((ckey, cid), dimension=1, num_keys=1)
    mask = (1 << bits) - 1
    ki = jax.lax.bitcast_convert_type(jnp.maximum(ckey, 0.0), jnp.int32)
    packed = (ki & ~mask) | cid
    s = jax.lax.sort(packed, dimension=1)
    centry_s = jax.lax.bitcast_convert_type(s & ~mask, jnp.float32)
    return centry_s, s & mask


def _per_ray_box_cull(rays, boxes, planes=None):
    """Exact per-ray slab vs the window's cluster boxes, reduced per tile.

    rays = (o, d, t_min, t_max) in tile layout (3 x [tiles, R, 1], ...);
    boxes [tiles, wbw, 6, S] (lo.xyz|hi.xyz groups, conservative bf16
    rounding upstream).  ``planes`` (optional, [tiles, wbw, 5, S]
    n.xyz|c|h groups): each surviving (ray, cluster) pair additionally
    requires the ray's box-clipped t-interval to CROSS the cluster's
    thick plane |n.p - c| <= h — near-planar clusters (heightfield
    patches, walls, floors) have AABBs much fatter than their geometry,
    and grazing rays/segments that pass the box miss the slab.  The
    threshold is inflated by the runtime fp-error bound of the two
    endpoint evaluations, so the test is conservative and the trace
    stays exact.  Returns (pass [tiles, wbw*S] — True iff ANY live ray
    survives — and entry [tiles, wbw*S] — min slab entry over passing
    rays, INF where none).  Everything fuses into the two reductions;
    no [tiles, R, W] array is kept live.
    """
    o, d, t_min_t, t_max_t = rays
    tiles, wbw, _, s_ = boxes.shape
    w = wbw * s_
    live = t_max_t > t_min_t                              # [tiles, R, 1]
    tn = jnp.broadcast_to(t_min_t, t_min_t.shape[:2] + (w,))
    tf = jnp.broadcast_to(t_max_t, t_max_t.shape[:2] + (w,))
    for c in range(3):
        lo_c = boxes[:, :, c, :].reshape(tiles, 1, w)
        hi_c = boxes[:, :, 3 + c, :].reshape(tiles, 1, w)
        inv = _safe_inv(d[c])
        t0 = (lo_c - o[c]) * inv
        t1 = (hi_c - o[c]) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    ok = (tn <= tf) & live
    if planes is not None:
        pn = [planes[:, :, j, :].reshape(tiles, 1, w) for j in range(3)]
        pc = planes[:, :, 3, :].reshape(tiles, 1, w)
        ph = planes[:, :, 4, :].reshape(tiles, 1, w)
        t0 = pn[0] * o[0]
        t1 = pn[1] * o[1]
        t2 = pn[2] * o[2]
        a = t0 + t1 + t2 - pc
        # fp-error bound of the endpoint evaluations must scale with the
        # MAGNITUDES of the summed terms (cancellation: |a| can be ~0
        # while each term is ~scene-scale and carries ~ulp(term) error)
        amag = jnp.abs(t0) + jnp.abs(t1) + jnp.abs(t2) + jnp.abs(pc)
        bb = pn[0] * d[0] + pn[1] * d[1] + pn[2] * d[2]
        d0 = a + tn * bb
        d1 = a + tf * bb
        thr = ph + 4e-6 * (amag
                           + jnp.maximum(jnp.abs(tn), jnp.abs(tf))
                           * jnp.abs(bb)) + 1e-25
        ok = ok & (jnp.minimum(d0, d1) <= thr) & (jnp.maximum(d0, d1) >= -thr)
    rpass = jnp.any(ok, axis=1)                           # [tiles, W]
    entry = jnp.min(jnp.where(ok, jnp.maximum(tn, 0.0), INF), axis=1)
    return rpass, entry


def _interval_slab_batched(o_lo, o_hi, d_lo, d_hi, lo, hi, t_lo, t_hi):
    """_interval_slab for per-tile box sets: lo/hi [tiles, wb, S, 3]."""
    tiles, wb, s_, _ = lo.shape
    tn = jnp.broadcast_to(t_lo[:, None, None], (tiles, wb, s_))
    tf = jnp.broadcast_to(t_hi[:, None, None], (tiles, wb, s_))
    for c in range(3):
        dl = d_lo[:, c:c + 1, None]
        dh = d_hi[:, c:c + 1, None]
        unconstrained = (dl <= 0.0) & (dh >= 0.0)
        il = jnp.where(unconstrained, 1.0,
                       1.0 / jnp.where(dh == 0.0, 1.0, dh))
        ih = jnp.where(unconstrained, 1.0,
                       1.0 / jnp.where(dl == 0.0, 1.0, dl))
        a1 = lo[:, :, :, c] - o_hi[:, c:c + 1, None]
        a2 = lo[:, :, :, c] - o_lo[:, c:c + 1, None]
        b1 = hi[:, :, :, c] - o_hi[:, c:c + 1, None]
        b2 = hi[:, :, :, c] - o_lo[:, c:c + 1, None]
        p_min = jnp.minimum(
            jnp.minimum(jnp.minimum(a1 * il, a1 * ih),
                        jnp.minimum(a2 * il, a2 * ih)),
            jnp.minimum(jnp.minimum(b1 * il, b1 * ih),
                        jnp.minimum(b2 * il, b2 * ih)))
        p_max = jnp.maximum(
            jnp.maximum(jnp.maximum(a1 * il, a1 * ih),
                        jnp.maximum(a2 * il, a2 * ih)),
            jnp.maximum(jnp.maximum(b1 * il, b1 * ih),
                        jnp.maximum(b2 * il, b2 * ih)))
        near = jnp.where(unconstrained, -_BIG, p_min)
        far = jnp.where(unconstrained, _BIG, p_max)
        tn = jnp.maximum(tn, near)
        tf = jnp.minimum(tf, far)
    return tn <= tf, jnp.maximum(tn, 0.0)


def _mt_rows(o, d, rows, t_min, t_max):
    """MT of [tiles, R] rays vs their gathered cluster rows [tiles, 9G].

    o/d: 3 planes of [tiles, R, 1]; t_min/t_max [tiles, R, 1].
    Returns (t, u, v) [tiles, R, G]."""
    p = [rows[:, k * G:(k + 1) * G][:, None, :] for k in range(9)]
    return _mt_planes(o, d, p, t_min, t_max)


def _mt_rows_multi(o, d, rows_list, t_min, t_max):
    """_mt_rows over ``len(rows_list)`` clusters at once: lane dim becomes
    pair*G (=128 at pair=2 — a full VPU row instead of half)."""
    p = [jnp.concatenate([r[:, k * G:(k + 1) * G] for r in rows_list],
                         axis=1)[:, None, :] for k in range(9)]
    return _mt_planes(o, d, p, t_min, t_max)


def _mt_planes(o, d, p, t_min, t_max):
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = p
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


# clusters per sweep round by workload-sorted segment tier (full width,
# >256 tiles, >32, tail).  pair*G is the MT lane width; wider rounds cut
# the serial round count at the cost of up to pair-1 clusters of
# overshoot per tile.  (1, 1, 4, 8) measured best on terrain-1M wb=16
# (r3s sweep: 16.4 ms vs 21.0 at the old (2, 4, 8, 16)): half the
# worklists hold <= 6 clusters, so pair-1 rounds at the wide tiers beat
# both the overshoot and the 128-lane epilogue cost, and only the tiny
# tail segments (grazing frusta, hundreds of clusters) pay for width.
# Module-level so perf scripts can sweep it (clear jit caches after).
_PAIR_SCHEDULE = (1, 1, 4, 8)
# workload-sorted segment shrink factor (4 = coarse, 2 = finer prefixes:
# less within-segment imbalance, more loop instances).  Measured on the
# real terrain-1M worklists (scripts/profile_r3c.py cost sim): factor 2 =
# 327M MT tests vs factor 4 = 488M at the (2,4,8,16) schedule (ideal =
# sum-of-worklists 215M) — the finer prefixes cut round-quantization
# waste, and the measured sweep fell 21.6 -> 15.6 ms at terrain-1M.
# (A prime+re-cull variant — sweep the 4 nearest clusters, tighten t_max,
# re-cull — was measured a wash: the sweep's `pending` bound already
# early-terminates on best-t, and the second cull pass costs a full
# window, +6.6 ms for a 12.8 -> 10.5 mean worklist shrink.  Reverted.)
_SEGMENT_FACTOR = 2


# Sweep row-fetch override for perf A/Bs (see fetch_rows in _sweep):
# None = auto (onehot below _ONEHOT_MAX_CLUSTERS, gather above).
_FETCH_MODE = None

# Closest-sweep epilogue strategy (module knob for perf A/Bs):
#   "defer"  — rounds carry (t, slot) only; the winning barycentrics
#              are reconstructed ONCE per trace from a [C*G, 9] row
#              gather (_slot_uv).
#   "argmin" — full argmin + one-hot u/v extraction every round.
# Slot selection is bit-identical between the two (first lane of the
# round minimum, strict cross-round better) — only u/v can drift ulps
# (same formula, different fusion context).
#
# "defer" is the DEFAULT on both paths (round 5).  The round-4 studies
# that measured it negative (r4l/r4m/r4m2) consumed one output lane, and
# XLA's while-loop simplifier deletes dead tuple carries — so the
# "argmin" baseline was silently measured in find-mode (u/v carries and
# their one-hot extraction DCE'd) and defer could never show its win.
# The honest consume-everything A/B (profile_r5g, tunneled v5e, real
# 1080p frame batches) has defer a decisive win on every batch:
# p1 primary 74.1 -> 46.3 ms, p1 bsdf-cand 168.6 -> 92.7, gi_bounce0
# trace 172.7 -> 95.7 (find-only floor 22.2/70.3), composed gi_bounce
# pass 227.0 -> 169.5 ms.  Slot selection is bit-identical; only u/v
# can drift ulps (same formula, different fusion context).
_CLOSEST_EPILOGUE = "defer"           # windowed path
_CLOSEST_EPILOGUE_FLAT = "defer"      # flat (small-scene) path

# Occlusion pair-width doubling (see _sweep); module knob for perf A/Bs.
# Default OFF on BOTH paths (round 4, TPU v5e): the r3 hypothesis (wider
# rounds halve the serial round count for the same MT work) lost to lane
# overshoot everywhere it was re-measured — flat 1080p garage pass-3
# shadow segments 70.1 ms doubled vs 46.2 undoubled (r4k), windowed
# terrain-1M in-field shadows 22.54 ms vs 19.38 (11.63 -> 13.53 Mrays/s,
# r4l).  Any hit retires a lane, so the overshoot never pays for itself
# on the short (p50 ~6-19 cluster) worklists both paths actually see.
_OCC_PAIR_DOUBLE = False


def _slot_uv(oc, dc, slot, cl_flat, g: int = G):
    """Barycentrics of each ray's winning sorted slot, reconstructed once
    per trace (the "defer" closest epilogue): ONE [*, 9]-row gather from
    the slot-major triangle table + one scalar MT evaluation per ray.
    Misses (slot < 0) return u = v = 0 like the in-round epilogue."""
    s = jnp.maximum(slot, 0)
    tri_rows = jnp.swapaxes(
        cl_flat.reshape(-1, 9, g), 1, 2).reshape(-1, 9)
    rows = tri_rows[s]                       # [N, 9] 36 B row gather
    p = [rows[:, k] for k in range(9)]
    _, u, v = _mt_planes(oc, dc, p, -_BIG, INF)
    found = slot >= 0
    return jnp.where(found, u, 0.0), jnp.where(found, v, 0.0)


def _sweep(best, ccid, centry, ccnt, rays, cl_flat, occlusion: bool,
           find: bool = False, g: int = G, pair_schedule=None,
           occ_double: bool | None = None, defer: bool = False):
    """Workload-sorted shrinking-prefix lockstep sweep over a cluster
    worklist (the proven phase-B machinery of ops/cluster_traverse.py):
    per round every live tile gathers ``pair`` cluster rows and runs dense
    [TILE x pair*G] MT with per-ray best-t culling.  pair=2 fills the full
    128-lane VPU row (G=64 alone wastes half the lanes) and halves the
    serial round count; the small tail segments (a few tiles with
    worklists of hundreds of clusters — grazing-angle frusta) widen to
    pair=4/8 so the tail is not hundreds of serial tiny rounds.  ``rays``
    = (o, d, t_min_t, t_max_t) in [tiles, TILE(, 1)] layout; ``best`` =
    (t, slot, u, v), or just (t,) in ``find`` mode.

    ``find=True`` runs min-only rounds: the carry is best-t alone and the
    winning slot/u/v extraction is skipped — measured 1.158 -> ~0.5 ms
    per full-width round at terrain-1M (the argmin + one-hot u/v
    epilogue is ~55% of a closest round).  `_sweep_closest` pairs it
    with a short identify pass."""
    o, d, t_min_t, t_max_t = rays
    tiles = ccnt.shape[0]
    perm = jnp.argsort(-ccnt)
    inv_perm = jnp.argsort(perm)
    ccnt = ccnt[perm]
    ccid = ccid[perm]
    centry = centry[perm]
    o = [c[perm] for c in o]
    d = [c[perm] for c in d]
    t_min_t = t_min_t[perm]
    t_max_t = t_max_t[perm]
    best = tuple(b[perm] for b in best)
    wcl = ccid.shape[1]

    def pending(k, best_t, lo, hi):
        nxt = jax.lax.dynamic_slice_in_dim(
            centry[lo:hi], k, 1, axis=1)[:, 0]
        if occlusion:
            live = jnp.any(best_t[lo:hi] > 0.0, axis=1)
            return (k < ccnt[lo:hi]) & live & (nxt < INF)
        bound = jnp.max(jnp.minimum(best_t[lo:hi], t_max_t[lo:hi, :, 0]),
                        axis=1)
        return (k < ccnt[lo:hi]) & (nxt < bound)

    # Row fetch: XLA row gathers cost ~136 ns/row regardless of width, so
    # at small cluster tables (<= _ONEHOT_MAX_CLUSTERS rows) rows are
    # fetched by an f32 one-hot matmul at HIGHEST precision instead — the
    # MXU-native gather, ~100x cheaper per row at 1080p tile counts, and
    # BIT-EXACT (each output element is 1.0*x + 0.0*rest; the bf16x3
    # decomposition of HIGHEST reproduces f32 exactly — TPU smoke test).
    # _FETCH_MODE overrides for perf A/Bs: "gather"/"onehot" force a
    # path; "fake" broadcasts row 0 (WRONG RESULTS — timing studies only,
    # measures the sweep with fetch cost removed).
    n_clusters = cl_flat.shape[0]
    onehot = n_clusters <= _ONEHOT_MAX_CLUSTERS
    if _FETCH_MODE == "onehot":
        onehot = True
    elif _FETCH_MODE == "gather":
        onehot = False
    cl_iota = jnp.arange(n_clusters, dtype=jnp.int32)[None, :]

    def fetch_rows(cid):
        """cid [size, pair] -> 9 planes of [size, 1, pair*g]."""
        size, pr = cid.shape
        if _FETCH_MODE == "fake":
            flat = jnp.broadcast_to(
                cl_flat[0] + cid.reshape(size * pr, 1).astype(jnp.float32)
                * 0.0, (size * pr, cl_flat.shape[1]))
        elif onehot:
            oh = (cid.reshape(size * pr, 1) == cl_iota).astype(jnp.float32)
            flat = jnp.dot(oh, cl_flat,
                           precision=jax.lax.Precision.HIGHEST)
        else:
            flat = cl_flat[cid.reshape(size * pr)]
        r3 = flat.reshape(size, pr, 9, g)
        return [r3[:, :, kk, :].reshape(size, 1, pr * g) for kk in range(9)]

    k = jnp.int32(0)
    sizes = _segment_sizes(tiles, _SEGMENT_FACTOR)
    for si, size in enumerate(sizes):
        lower = sizes[si + 1] if si + 1 < len(sizes) else 0
        # wider rounds as the live prefix shrinks: the tail tiles hold
        # hundreds of clusters (grazing frusta) and serialize the sweep
        tier = (0 if size > 2048 else 1 if size > 256 else
                2 if size > 32 else 3)
        pair = (pair_schedule or _PAIR_SCHEDULE)[tier]
        dbl = _OCC_PAIR_DOUBLE if occ_double is None else occ_double
        if occlusion and dbl:
            # measured NEGATIVE on both paths (see _OCC_PAIR_DOUBLE);
            # kept behind the knob as a documented study
            pair = min(pair * 2, max(1, 1024 // g))
        pair = max(1, min(pair, wcl))   # narrow worklists (prime pass)
        lane = jax.lax.iota(jnp.int32, pair * g)[None, None, :]
        wl_s = ccid[:size]
        o_s = [c[:size] for c in o]
        d_s = [c[:size] for c in d]
        tmin_s = t_min_t[:size]
        tmax_s = t_max_t[:size]

        def cond(st, lower=lower, size=size):
            kk, best_t = st[0], st[1]
            return (kk < wcl) & jnp.any(pending(kk, best_t, lower, size))

        def body(st, size=size, wl_s=wl_s, o_s=o_s, d_s=d_s,
                 tmin_s=tmin_s, tmax_s=tmax_s, pair=pair, lane=lane):
            kk, best_t = st[0], st[1]
            # pair cluster ids in ONE slice (start clamps so the slice
            # stays in range; trailing lanes are masked by in_cnt below)
            cids = jax.lax.dynamic_slice_in_dim(
                wl_s, jnp.minimum(kk, wcl - pair), pair, axis=1)
            p = fetch_rows(cids)                # 9 x [size, 1, pair*G]
            active = pending(kk, best_t, 0, size)[:, None, None]
            # mask lanes whose cluster slot is past this tile's count or
            # belongs to a clamped (re-read) worklist column
            start = jnp.minimum(kk, wcl - pair)
            col = start + jnp.arange(pair, dtype=jnp.int32)[None, :]
            in_cnt = (col >= kk) & (col < ccnt[:size, None])  # [size, pair]
            lane_ok = jnp.repeat(in_cnt, g, axis=1)[:, None, :]
            cut = jnp.minimum(best_t[..., None], tmax_s)
            t, u, v = _mt_planes(o_s, d_s, p, tmin_s, cut)
            t = jnp.where(active & lane_ok, t, INF)
            if occlusion:
                hit = jnp.any(t < INF, axis=-1)
                best_t = jnp.where(hit, 0.0, best_t)
                return (kk + pair, best_t) + st[2:]
            t_c = jnp.min(t, axis=-1)
            if find:
                return (kk + pair, jnp.minimum(best_t, t_c))
            if defer:
                # (t, slot) carry: same argmin lane select as the legacy
                # branch (XLA's variadic reduce — measured faster than a
                # min + eq + where-min chain, r4m), minus the one-hot u/v
                # extraction; u/v reconstructed once per trace (_slot_uv)
                best_tri = st[2]
                lidx = jnp.argmin(t, axis=-1)
                slot = lidx
                for j in range(pair):
                    in_j = (lidx >= j * g) & (lidx < (j + 1) * g)
                    slot = jnp.where(
                        in_j, cids[:, j:j + 1] * g + lidx - j * g, slot)
                better = t_c < best_t
                return (
                    kk + pair,
                    jnp.where(better, t_c, best_t),
                    jnp.where(better, slot, best_tri),
                )
            best_tri, best_u, best_v = st[2], st[3], st[4]
            idx = jnp.argmin(t, axis=-1)
            hot = idx[..., None] == lane
            u_c = jnp.sum(jnp.where(hot, u, 0.0), axis=-1)
            v_c = jnp.sum(jnp.where(hot, v, 0.0), axis=-1)
            slot = idx
            for j in range(pair):
                in_j = (idx >= j * g) & (idx < (j + 1) * g)
                slot = jnp.where(
                    in_j, cids[:, j:j + 1] * g + idx - j * g, slot)
            better = t_c < best_t
            return (
                kk + pair,
                jnp.where(better, t_c, best_t),
                jnp.where(better, slot, best_tri),
                jnp.where(better, u_c, best_u),
                jnp.where(better, v_c, best_v),
            )

        st = (k,) + tuple(bb[:size] for bb in best)
        st = jax.lax.while_loop(cond, body, st)
        k = st[0]
        best = tuple(
            jnp.concatenate([new, old[size:]], axis=0)
            for new, old in zip(st[1:], best)
        )

    return tuple(bb[inv_perm] for bb in best)


# Closest-hit sweep strategy: True = find (min-only rounds) + identify
# (prefix re-sweep with full epilogue); False = one full sweep with the
# epilogue every round.  The split only pays when the identify prefix
# shrinks well below the find worklist; r3g measured terrain-1M shrink at
# 12.8 -> 10.8 clusters/tile and the r3o A/B put the single sweep at
# 23.2 ms vs the split's 30.5 ms (same build, same tail) — so single
# sweep is the default.  Module-level for perf A/Bs (clear jit caches
# after changing).
_FIND_IDENTIFY = False


def _sweep_closest(best, ccid, centry, ccnt, rays, cl_flat):
    """Closest-hit sweep as FIND + IDENTIFY (r3f measurement: the argmin
    + one-hot u/v epilogue is ~55% of a full round's cost, but the winner
    only has to be identified ONCE).

    Find: min-only rounds over the whole worklist give every ray its
    best-t.  Identify: re-sweep with full epilogue, but only over the
    worklist prefix whose entries precede the tile's farthest improved
    bound (centry is sorted, so the filter is just a prefix count), with
    every ray's t_max pinned just above its found t.

    The bump slack is RELATIVE (2^-13 ≈ 1.2e-4), not a couple of ulps:
    find and identify are different `_mt_planes` call sites in the same
    program, and XLA may fuse/contract them differently, so identify's
    hit t can drift a few ulps from find's (observed on the 8-device CPU
    mesh: a 2-ulp bump rejected 3/257 true hits).  Exactness survives
    the slack through the strict-min carry: every candidate admitted by
    the loosened cut is tested and the min picks the true winner, and
    every cluster holding an admitted candidate is inside the prefix
    (entry ≤ t < bump ≤ bound).  Rays that did not improve in this
    window sweep with t_max 0, preserving their carried best (the find
    pass proved nothing in this window beats it)."""
    o, d, t_min_t, t_max_t = rays
    defer = len(best) == 2
    if not _FIND_IDENTIFY:
        return _sweep(best, ccid, centry, ccnt, rays, cl_flat, False,
                      defer=defer)
    bt = _sweep((best[0],), ccid, centry, ccnt, rays, cl_flat,
                False, find=True)[0]
    improved = bt < best[0]
    bump = jnp.where(improved, bt * (1.0 + 2.0 ** -13) + 1e-30, 0.0)
    rays_id = (o, d, t_min_t, jnp.minimum(t_max_t, bump[..., None]))
    bound = jnp.max(jnp.where(improved, bump, -_BIG), axis=1)  # [tiles]
    ccnt_id = jnp.sum((centry <= bound[:, None]) & (centry < INF), axis=1)
    return _sweep(best, ccid, centry, jnp.minimum(ccnt_id, ccnt),
                  rays_id, cl_flat, False, defer=defer)


# single-level flat path below this many clusters (<= 8k tris): the
# block machinery degenerates at 1-4 blocks, and profile_r3h measured
# the windowed path at 81 ns/ray on the 2.2k-tri garage where brute
# costs 36 — the flat path's one exact per-ray cull + one plain sweep
# tests ~640 tris/ray there (worklists mean 8.4 clusters/tile)
_FLAT_MAX_CLUSTERS = 128

# Fine flat path: re-slice the flat sweep at gf=16-triangle sub-clusters
# (4 per stored G=64 cluster).  The idea: the coarse flat path tests
# ~640 tris/ray on the 2.2k-tri garage (mean worklist 8.4 clusters x
# 64), and 16-triangle culling should shrink the sweep ~3-4x for a
# 4x-wider per-ray box cull.  MEASURED NEGATIVE (round 4, TPU v5e): the
# garage-256 ReSTIR frame runs 254.9 ms fine vs 175.2 ms coarse
# (bit-identical images) — the 4x-wider cull ([tiles, R, 256] slab) and
# the 4x-longer packed sort cost more than the sweep shrink saves, and
# this path carried the ENTIRE BENCH_r03 flagship regression (127.5 ->
# 242.7 ms; it shipped in the round-3 end-of-round snapshot without a
# TPU measurement).  Kept as a documented study behind the toggle;
# None = coarse path (default).
_FLAT_FINE_G = None
_FLAT_FINE_PAIRS = (8, 8, 8, 8)   # 128-lane rounds at gf=16


def _fine_tables(accel: StreamAccel, gf: int):
    """[Cf, 9*gf] fine triangle rows + per-fine-cluster AABB planes.

    Padded (perm < 0) slots are excluded from the boxes, so all-padding
    fine clusters get empty boxes (lo=+INF > hi=-INF) and never pass the
    cull."""
    c = accel.num_blocks * S
    cl = accel.cl_flat                        # [C, 9G] plane-major
    r = cl.reshape(c, 9, G // gf, gf)
    fine = jnp.transpose(r, (0, 2, 1, 3)).reshape(c * (G // gf), 9 * gf)
    cf = fine.shape[0]
    valid = accel.perm.reshape(cf, gf) >= 0
    lo, hi = [], []
    for k in range(3):
        v0 = fine[:, k * gf:(k + 1) * gf]
        v1 = v0 + fine[:, (3 + k) * gf:(4 + k) * gf]
        v2 = v0 + fine[:, (6 + k) * gf:(7 + k) * gf]
        mn = jnp.minimum(jnp.minimum(v0, v1), v2)
        mx = jnp.maximum(jnp.maximum(v0, v1), v2)
        lo.append(jnp.min(jnp.where(valid, mn, INF), axis=1))
        hi.append(jnp.max(jnp.where(valid, mx, -INF), axis=1))
    return fine, lo, hi


def _trace_flat(origins, dirs, accel: StreamAccel, t_min, t_max,
                occlusion: bool):
    """Small-scene trace: no block level, no windows, no find+identify.

    One exact per-ray slab against ALL (sub-)cluster boxes, one packed
    near-to-far sort, one shrinking-prefix sweep over the whole worklist
    (at gf=_FLAT_FINE_G triangles per sweep round when enabled — see
    _fine_tables).  The find+identify split is skipped deliberately: at
    small scenes the identify prefix barely shrinks (garage: 7.8 of 8.4
    clusters useful), so the split costs more than the epilogue it
    saves."""
    oc, dc = _as_planes3(origins), _as_planes3(dirs)
    n = oc[0].shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    n_pad = -(-n // TILE) * TILE
    pad = n_pad - n
    if pad:
        oc = tuple(jnp.pad(c, (0, pad)) for c in oc)
        dc = tuple(jnp.pad(c, (0, pad), constant_values=1.0) for c in dc)
        t_min = jnp.pad(t_min, (0, pad))
        t_max = jnp.pad(t_max, (0, pad), constant_values=-1.0)
    tiles = n_pad // TILE
    b = accel.num_blocks
    c_all = b * S
    o = [c.reshape(tiles, TILE)[..., None] for c in oc]
    d = [c.reshape(tiles, TILE)[..., None] for c in dc]
    t_min_t = t_min.reshape(tiles, TILE)[..., None]
    t_max_t = t_max.reshape(tiles, TILE)[..., None]
    rays = (o, d, t_min_t, t_max_t)

    gf = _FLAT_FINE_G
    if gf and gf < G:
        tab, f_lo, f_hi = _fine_tables(accel, gf)
        cf = tab.shape[0]
        cf_pad = -(-cf // 128) * 128
        def padp(p, v):
            return jnp.pad(p, (0, cf_pad - cf), constant_values=v)
        boxes = jnp.broadcast_to(
            jnp.stack([padp(p, INF) for p in f_lo]
                      + [padp(p, -INF) for p in f_hi],
                      axis=0)[None, None],              # [1, 1, 6, cf_pad]
            (tiles, 1, 6, cf_pad))
        c_all, g_sw, cl_tab = cf_pad, gf, tab
        pairs = _FLAT_FINE_PAIRS
        planes = None   # fine sub-clusters carry no slab metadata
    else:
        boxes = jnp.broadcast_to(accel.blk_boxes[None, :, :, :S],
                                 (tiles, b, 6, S))
        planes = jnp.broadcast_to(accel.blk_planes[None, :, :, :S],
                                  (tiles, b, 5, S))
        g_sw, cl_tab, pairs = G, accel.cl_flat, None

    rpass, rentry = _per_ray_box_cull(rays, boxes, planes)  # [tiles, c_all]
    cid = jnp.broadcast_to(jnp.arange(c_all, dtype=jnp.int32)[None, :],
                           (tiles, c_all))
    ckey = jnp.where(rpass, rentry, INF)
    centry, ccid = _packed_sort(ckey, cid, c_all)
    ccnt = jnp.sum(rpass.astype(jnp.int32), axis=1)

    zero = jnp.zeros((tiles, TILE), jnp.float32)
    defer = _CLOSEST_EPILOGUE_FLAT == "defer"
    if occlusion:
        best = (jnp.where(t_max_t[:, :, 0] > 0.0, INF, 0.0),)
    elif defer:
        best = (zero + INF, zero.astype(jnp.int32) - 1)
    else:
        best = (zero + INF, zero.astype(jnp.int32) - 1, zero, zero)
    best = _sweep(best, ccid, centry, ccnt, rays, cl_tab,
                  occlusion, g=g_sw, pair_schedule=pairs, defer=defer)
    out = tuple(bb.reshape(n_pad)[:n] for bb in best)
    if not occlusion and defer:
        u, v = _slot_uv(tuple(c[:n] for c in oc),
                        tuple(c[:n] for c in dc), out[1], cl_tab, g=g_sw)
        out = out + (u, v)
    return out


@functools.partial(jax.jit, static_argnames=("occlusion", "wb"))
def _trace_stream_xla(origins, dirs, accel: StreamAccel, t_min, t_max,
                      occlusion: bool, wb: int):
    """Pure-XLA trace: block windows of interval-culled cluster worklists
    + workload-sorted shrinking-prefix MT sweeps (per-ray exact).

    Window 0 covers each tile's wb nearest overlapped blocks; the tail is
    a while_loop over further wb-wide windows that runs only while some
    tile still has unresolved farther blocks, normally on a compacted
    live-tile prefix — so miss-heavy scenes stay correct without paying
    full-width sorting everywhere, and coverage is structurally complete
    at any scene size.

    Scenes at <= _FLAT_MAX_CLUSTERS clusters take the single-level flat
    path (static shape-derived choice).
    """
    if accel.num_blocks * S <= _FLAT_MAX_CLUSTERS:
        return _trace_flat(origins, dirs, accel, t_min, t_max, occlusion)
    oc, dc = _as_planes3(origins), _as_planes3(dirs)
    n = oc[0].shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    n_pad = -(-n // TILE) * TILE
    pad = n_pad - n
    if pad:
        oc = tuple(jnp.pad(c, (0, pad)) for c in oc)
        dc = tuple(jnp.pad(c, (0, pad), constant_values=1.0) for c in dc)
        t_min = jnp.pad(t_min, (0, pad))
        t_max = jnp.pad(t_max, (0, pad), constant_values=-1.0)  # never hits
    tiles = n_pad // TILE
    bp = accel.num_blocks

    o = [c.reshape(tiles, TILE)[..., None] for c in oc]
    d = [c.reshape(tiles, TILE)[..., None] for c in dc]
    t_min_t = t_min.reshape(tiles, TILE)[..., None]
    t_max_t = t_max.reshape(tiles, TILE)[..., None]
    rays = (o, d, t_min_t, t_max_t)
    cl_flat = accel.cl_flat

    sbid, skey, bcnt, tb = _block_sort(oc, dc, t_min, t_max, accel,
                                       rays)

    zero = jnp.zeros((tiles, TILE), jnp.float32)
    defer = _CLOSEST_EPILOGUE == "defer"
    if occlusion:
        # best_t > 0 means "not yet occluded"; padding rays start retired
        best = (jnp.where(t_max_t[:, :, 0] > 0.0, INF, 0.0),)
    elif defer:
        best = (zero + INF, zero.astype(jnp.int32) - 1)
    else:
        best = (zero + INF, zero.astype(jnp.int32) - 1, zero, zero)

    # Window plan (round 3): window 0 — each tile's wb nearest blocks —
    # runs full-width (most tiles are live there).  The TAIL is a
    # lax.while_loop whose normal path fires ONCE: when <= K tiles are
    # still live (measured: 10/4096 at terrain-1M, wb=32) it gathers that
    # K-tile prefix and resolves ALL remaining blocks in one catch-all
    # pass (affordable at K=64 rows even at thousands of clusters); while
    # > K tiles are live it steps full-width wb windows.  Coverage is
    # structurally complete at any scene size, and the loop body compiles
    # ONCE instead of once per unrolled window (the axon remote compile
    # service makes every extra instantiation minutes-slow).
    ccid0, centry0, ccnt0 = _cluster_window(
        sbid, skey, tb, accel, wb, 0, rays)
    if occlusion:
        best = _sweep(best, ccid0, centry0, ccnt0, rays, cl_flat, True)
    else:
        best = _sweep_closest(best, ccid0, centry0, ccnt0, rays, cl_flat)

    if bp > wb:
        K = min(tiles, 64)
        pad_b = (-bp) % wb
        sbid_p = jnp.pad(sbid, ((0, 0), (0, pad_b)))
        skey_p = jnp.pad(skey, ((0, 0), (0, pad_b)), constant_values=INF)

        def win_live(w0, best_t):
            """Per-tile 'still needs blocks ranked >= w0' mask."""
            has_more = bcnt > w0
            if occlusion:
                return has_more & jnp.any(best_t > 0.0, axis=1)
            col = jax.lax.dynamic_slice_in_dim(skey_p, w0, 1, axis=1)[:, 0]
            bound = jnp.max(jnp.minimum(best_t, t_max_t[:, :, 0]), axis=1)
            return has_more & (col < bound)

        def wcond(state):
            w0, best = state
            return (w0 < bp) & jnp.any(win_live(w0, best[0]))

        def sweep_window(best_w, rays_w, tb_w, wl, wk, alive):
            ccid, centry, ccnt = _cluster_window_wl(
                wl, wk, tb_w, accel, rays_w)
            ccnt = jnp.where(alive, ccnt, 0)
            if occlusion:
                return _sweep(best_w, ccid, centry, ccnt, rays_w,
                              cl_flat, True)
            return _sweep_closest(best_w, ccid, centry, ccnt, rays_w,
                                  cl_flat)

        def wbody(state):
            w0, best = state
            live = win_live(w0, best[0])
            nlive = jnp.sum(live.astype(jnp.int32))

            def run_catchall(best):
                # <= K tiles still live: gather them and resolve ALL
                # remaining blocks in ONE pass over ranks [wb, bp) —
                # a static-width window, so the loop finishes next test.
                # (Ranks [wb, w0) may be re-swept: exact — best-t only
                # tightens and occlusion is idempotent.)
                sel = jnp.argsort(jnp.logical_not(live))[:K]
                rays_s = ([c[sel] for c in o], [c[sel] for c in d],
                          t_min_t[sel], t_max_t[sel])
                tb_s = tuple(x[sel] for x in tb)
                wl = sbid_p[sel][:, wb:]
                wk = skey_p[sel][:, wb:] < INF
                best_s = sweep_window(tuple(b[sel] for b in best),
                                      rays_s, tb_s, wl, wk, live[sel])
                best = tuple(b.at[sel].set(bs)
                             for b, bs in zip(best, best_s))
                return jnp.int32(bp), best

            def run_full(best):
                # > K tiles live (right after window 0 on frustum-heavy
                # scenes): one more full-width wb window, then re-test.
                wl = jax.lax.dynamic_slice_in_dim(sbid_p, w0, wb, axis=1)
                wk = jax.lax.dynamic_slice_in_dim(
                    skey_p, w0, wb, axis=1) < INF
                return w0 + wb, sweep_window(best, rays, tb, wl, wk, live)

            return jax.lax.cond(nlive <= K, run_catchall, run_full, best)

        _, best = jax.lax.while_loop(wcond, wbody, (jnp.int32(wb), best))

    out = tuple(bb.reshape(n_pad)[:n] for bb in best)
    if not occlusion and defer:
        u, v = _slot_uv(tuple(c[:n] for c in oc),
                        tuple(c[:n] for c in dc), out[1], cl_flat)
        out = out + (u, v)
    return out


def coherence_order(origins, dirs, accel: StreamAccel):
    """Spatial presort permutation: morton codes of a point advanced along
    each ray, so 64-ray tiles get compact frusta whatever the caller's ray
    order (primary pixels, GI bounces, shadow batches).  Accepts AoS or
    planar rays; returns (order, inverse) device int32 arrays."""
    o, d = _as_planes3(origins), _as_planes3(dirs)
    lo = jnp.min(accel.top_lo, axis=0)
    hi = jnp.max(accel.top_hi, axis=0)
    step = 0.25 * jnp.max(hi - lo)
    pt = jnp.stack([o[c] + d[c] * step for c in range(3)], axis=-1)
    key = morton_codes(pt, lo, hi)
    order = jnp.argsort(key).astype(jnp.int32)
    return order, jnp.argsort(order).astype(jnp.int32)


def closest_hit_stream_xla(origins, dirs, accel: StreamAccel,
                           t_min=1e-4, t_max=1e4, wb: int = 16,
                           presort: bool = False) -> Hit:
    """Closest hit via the pure-XLA stream traversal (default path).

    origins/dirs: [N, 3] AoS or 3-tuples of [N] planes (the planar form
    avoids [N, 3] lane-padding at fusion boundaries — see
    intersect.as_planes3)."""
    o, d = _as_planes3(origins), _as_planes3(dirs)
    if presort:
        n = o[0].shape[0]
        t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        order, inverse = coherence_order(o, d, accel)
        # pack rays/results so each permutation is ONE wide-row gather
        # (per-ray gathers cost ~7-12 ns/row regardless of width)
        packed = jnp.stack(list(o) + list(d) + [t_min, t_max],
                           axis=1)[order]
        hit = closest_hit_stream_xla(
            tuple(packed[:, c] for c in range(3)),
            tuple(packed[:, 3 + c] for c in range(3)), accel,
            packed[:, 6], packed[:, 7], wb, presort=False)
        res = jnp.stack(
            [hit.t, hit.tri.astype(jnp.float32), hit.u, hit.v],
            axis=1)[inverse]
        # tri ids ride as float VALUES (exact below 2^24 — bitcast would
        # denormal-flush small ids on TPU); assert the range statically
        assert accel.perm.shape[0] < (1 << 24)
        return Hit(t=res[:, 0], tri=res[:, 1].astype(jnp.int32),
                   u=res[:, 2], v=res[:, 3])
    t, slot, u, v = _trace_stream_xla(
        o, d, accel,
        jnp.asarray(t_min, jnp.float32), jnp.asarray(t_max, jnp.float32),
        False, wb)
    found = slot >= 0
    orig = jnp.where(found, accel.perm[jnp.maximum(slot, 0)], 0)
    return Hit(t=jnp.where(found, t, INF), tri=orig.astype(jnp.int32),
               u=u, v=v)


def any_hit_stream_xla(origins, dirs, accel: StreamAccel,
                       t_min, t_max, wb: int = 16,
                       presort: bool = False,
                       reverse: bool = False) -> jax.Array:
    """Occlusion query via the pure-XLA stream traversal.

    "Occluded" is encoded as best_t forced to 0 during the sweep.

    ``reverse=True`` traces each segment from its FAR endpoint toward the
    origin — segment occlusion is symmetric up to float rounding: the
    reconstructed far origin shifts hit parameters by a few ulps, so a
    hit within ~1e-6 (relative) of t_max can flip (measured: exactly 1
    of 262144 segments on the garage pass-3 batch).  This was the
    round-2 shadow fast path (reversed tiles share a near-common origin,
    so interval frusta collapse to tight cones), but the round-3 exact
    per-ray block cull removed the interval-frustum weakness it
    compensated for, and forward tracing now wins on every measured
    batch (r3p2 grid) — the dispatch traces forward; the flag remains
    for measurement."""
    o, d = _as_planes3(origins), _as_planes3(dirs)
    n = o[0].shape[0]
    if reverse:
        t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        # masked rays (t_max <= t_min) must stay masked after reversal:
        # span < 0 keeps far < near, and the liveness mask below returns
        # False for them either way
        span = t_max - t_min
        far = tuple(o[c] + d[c] * t_max for c in range(3))
        occ = any_hit_stream_xla(far, tuple(-d[c] for c in range(3)),
                                 accel, jnp.zeros_like(span), span, wb,
                                 presort=presort, reverse=False)
        return occ & (span > 0.0)
    if presort:
        t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        order, inverse = coherence_order(o, d, accel)
        packed = jnp.stack(list(o) + list(d) + [t_min, t_max],
                           axis=1)[order]
        occ = any_hit_stream_xla(tuple(packed[:, c] for c in range(3)),
                                 tuple(packed[:, 3 + c] for c in range(3)),
                                 accel, packed[:, 6], packed[:, 7], wb,
                                 presort=False)
        return occ[inverse]
    (t,) = _trace_stream_xla(
        o, d, accel,
        jnp.asarray(t_min, jnp.float32), jnp.asarray(t_max, jnp.float32),
        True, wb)
    # masked rays (t_max <= t_min) start "retired" with the same t=0
    # encoding as occluded — they are NOT occluded
    n = t.shape[0]
    live = (jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
            > jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,)))
    return (t <= 0.0) & live
