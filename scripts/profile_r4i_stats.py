"""Round-4 part I (CPU-only): garage cluster-quality and worklist stats.

The r4h TPU measurement shows every 1080p garage trace site running at
the brute roofline (~36 ns/ray): tile-union worklists are 28-29 of 64
clusters, so the flat path tests ~84% of the scene per ray.  Questions
this script answers WITHOUT the TPU (pure geometry, numpy):

1. Per-cluster AABB fatness: what fraction of the scene's bounding
   volume does each cluster's box span?  (Hypothesis: the garage's huge
   wall/floor triangles give their clusters room-sized boxes that every
   ray passes, destroying culling.)
2. Per-RAY exact cluster-pass counts (the culling ideal) for the real
   batch types: primary, scattered GI continuation, pixel-coherent NEE
   shadow segments (bounded t).  If per-ray ~= tile-union, clustering
   is the problem; if per-ray << union, tiling granularity is.
3. The same after an area-split clustering: big triangles (top ~3% by
   AABB volume) pulled into a dedicated always-tested set, remaining
   tris median-clustered.  Predicted tests/ray = big_set + 64 *
   per-ray clusters.
4. Tile-union stats at TILE in {8, 16, 64} with and without a
   direction-octant+origin sort, for the scattered GI batch.

Run on CPU (jax_platforms=cpu) — safe alongside a TPU job.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401
from royaltracer_dx_tpu.cli import build_scene
from royaltracer_dx_tpu.camera import Camera
from royaltracer_dx_tpu.config import RenderConfig


def say(*a):
    print(*a, flush=True)


def tri_aabbs(tv):
    lo = tv.min(axis=1)
    hi = tv.max(axis=1)
    return lo, hi


def slab_counts(o, d, t0, t1, lo, hi):
    """Per-ray exact slab pass count vs every box.  o,d [N,3];
    lo,hi [C,3]; t0,t1 [N].  Chunked; returns [N] int counts."""
    n = o.shape[0]
    out = np.zeros(n, np.int32)
    step = 65536
    for s in range(0, n, step):
        e = min(n, s + step)
        oo = o[s:e, None, :]
        dd = d[s:e, None, :]
        inv = np.where(np.abs(dd) > 1e-12, 1.0 / np.where(dd == 0, 1, dd),
                       np.sign(dd) * 1e12 + (dd == 0) * 1e12)
        a = (lo[None] - oo) * inv
        b = (hi[None] - oo) * inv
        tn = np.minimum(a, b).max(axis=2)
        tf = np.maximum(a, b).min(axis=2)
        tn = np.maximum(tn, t0[s:e, None])
        tf = np.minimum(tf, t1[s:e, None])
        out[s:e] = (tn <= tf).sum(axis=1)
    return out


def cluster_boxes(tv, order, g=64):
    """AABBs of clusters of g consecutive tris in `order`."""
    lo, hi = tri_aabbs(tv)
    t = order.shape[0]
    c = -(-t // g)
    pad = c * g - t
    loo = np.concatenate([lo[order], np.full((pad, 3), np.inf)])
    hii = np.concatenate([hi[order], np.full((pad, 3), -np.inf)])
    clo = loo.reshape(c, g, 3).min(axis=1)
    chi = hii.reshape(c, g, 3).max(axis=1)
    return clo, chi


def median_order(cent, ids, leaf=64):
    """Recursive longest-axis median split -> triangle order."""
    if ids.shape[0] <= leaf:
        return [ids]
    c = cent[ids]
    ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
    srt = ids[np.argsort(c[:, ax], kind="stable")]
    h = ids.shape[0] // 2
    return median_order(cent, srt[:h], leaf) + \
        median_order(cent, srt[h:], leaf)


def stats(name, counts, c_total):
    say(f"  {name}: mean {counts.mean():6.2f}  p50 {np.percentile(counts, 50):5.0f}"
        f"  p99 {np.percentile(counts, 99):5.0f}  max {counts.max():4d}"
        f"  (of {c_total})")


def union_stats(name, o, d, t0, t1, clo, chi, tile, sort_key=None):
    n = o.shape[0]
    if sort_key is not None:
        perm = np.argsort(sort_key, kind="stable")
        o, d, t0, t1 = o[perm], d[perm], t0[perm], t1[perm]
    ntile = n // tile * tile
    # per-ray pass masks, unioned per tile
    step = 65536
    uni = []
    for s in range(0, ntile, step):
        e = min(ntile, s + step)
        oo = o[s:e, None, :]
        dd = d[s:e, None, :]
        inv = 1.0 / np.where(np.abs(dd) < 1e-12, 1e-12, dd)
        a = (clo[None] - oo) * inv
        b = (chi[None] - oo) * inv
        tn = np.maximum(np.minimum(a, b).max(axis=2), t0[s:e, None])
        tf = np.minimum(np.maximum(a, b).min(axis=2), t1[s:e, None])
        ok = tn <= tf
        ok = ok.reshape(-1, tile, ok.shape[1]).any(axis=1)
        uni.append(ok.sum(axis=1))
    uni = np.concatenate(uni)
    stats(f"{name} TILE={tile}" + (" sorted" if sort_key is not None
                                   else ""), uni, clo.shape[0])


def main():
    scene, camera = build_scene("reference")
    cfg = RenderConfig(width=1920, height=1080)
    flat = scene.flatten()
    tv = np.asarray(flat.tri_verts)     # [T, 3, 3]
    t = tv.shape[0]
    say(f"garage tris: {t}")

    lo, hi = tri_aabbs(tv)
    scene_lo, scene_hi = lo.min(axis=0), hi.max(axis=0)
    span = scene_hi - scene_lo
    vol = np.prod(hi - lo + 1e-9, axis=1) / np.prod(span)
    say(f"tri AABB relative volume: p50 {np.percentile(vol, 50):.2e} "
        f"p90 {np.percentile(vol, 90):.2e} p99 {np.percentile(vol, 99):.2e} "
        f"max {vol.max():.2e}")
    big = np.argsort(-vol)
    say("top-16 tri volumes:", np.round(vol[big[:16]], 4))

    cent = tv.mean(axis=1)

    # current-style median clustering on ALL tris
    order_all = np.concatenate(median_order(cent, np.arange(t)))
    clo, chi = cluster_boxes(tv, order_all)
    cvol = np.prod(chi - clo, axis=1) / np.prod(span)
    say(f"clusters: {clo.shape[0]}  box rel-volume: p50 "
        f"{np.percentile(cvol, 50):.3f} p90 {np.percentile(cvol, 90):.3f} "
        f"max {cvol.max():.3f}  sum {cvol.sum():.2f}")

    # area-split clustering: big tris out
    nbig = 128
    big_ids = big[:nbig]
    small_ids = np.setdiff1d(np.arange(t), big_ids)
    order_sm = np.concatenate(median_order(cent, small_ids))
    slo, shi = cluster_boxes(tv, order_sm)
    svol = np.prod(shi - slo, axis=1) / np.prod(span)
    say(f"small-only clusters: {slo.shape[0]}  box rel-volume: p50 "
        f"{np.percentile(svol, 50):.3f} p90 {np.percentile(svol, 90):.3f} "
        f"max {svol.max():.3f}  sum {svol.sum():.2f}")

    # ---- real batches ----
    rng = np.random.default_rng(7)

    # primary rays
    from royaltracer_dx_tpu.camera import generate_rays
    px = rng.uniform(size=(1 << 16, 2))
    w_, h_ = cfg.width, cfg.height
    xs = (px[:, 0] * w_).astype(np.float32)
    ys = (px[:, 1] * h_).astype(np.float32)
    import jax.numpy as jnp
    arrs = {k: jnp.asarray(v) for k, v in
            camera.matrices(w_ / h_).items()}
    o_j, d_j = generate_rays(arrs, w_, h_, xs=jnp.asarray(xs),
                             ys=jnp.asarray(ys))
    o_p = np.asarray(o_j, np.float32)
    d_p = np.asarray(d_j, np.float32)
    n = o_p.shape[0]
    t0 = np.full(n, 1e-4, np.float32)
    t1 = np.full(n, 1e4, np.float32)

    say("\nper-ray exact cluster-pass counts:")
    stats("primary  vs all-tris clusters", slab_counts(o_p, d_p, t0, t1, clo, chi), clo.shape[0])
    stats("primary  vs small-only clusters", slab_counts(o_p, d_p, t0, t1, slo, shi), slo.shape[0])

    # scattered GI-like rays: origins on surfaces (random tri points),
    # random cosine directions
    ti = rng.integers(0, t, n)
    uv = rng.uniform(size=(n, 2))
    u = 1 - np.sqrt(uv[:, 0])
    v = uv[:, 1] * np.sqrt(uv[:, 0])
    p0 = tv[ti, 0] + (tv[ti, 1] - tv[ti, 0]) * u[:, None] + \
        (tv[ti, 2] - tv[ti, 0]) * v[:, None]
    dr = rng.normal(size=(n, 3))
    dr /= np.linalg.norm(dr, axis=1, keepdims=True)
    stats("GI-scat  vs all-tris clusters", slab_counts(p0.astype(np.float32), dr.astype(np.float32), t0, t1, clo, chi), clo.shape[0])
    stats("GI-scat  vs small-only clusters", slab_counts(p0.astype(np.float32), dr.astype(np.float32), t0, t1, slo, shi), slo.shape[0])

    # shadow segments: surface point -> random lamp point (the scene's
    # collected emissive-triangle table; world-bake via instance is
    # identity for the garage's single instance)
    lv = np.asarray(flat.lights.verts, np.float32)   # [L, 3, 3]
    if lv.shape[0] == 0:
        say("no emissive tris found; skipping shadow stats")
    else:
        li = rng.integers(0, lv.shape[0], n)
        uv = rng.uniform(size=(n, 2))
        u = 1 - np.sqrt(uv[:, 0])
        v = uv[:, 1] * np.sqrt(uv[:, 0])
        lp = lv[li, 0] + (lv[li, 1] - lv[li, 0]) * u[:, None] + \
            (lv[li, 2] - lv[li, 0]) * v[:, None]
        seg = lp - p0
        dist = np.linalg.norm(seg, axis=1)
        dirs = seg / np.maximum(dist[:, None], 1e-9)
        t1s = (dist * (1 - 1e-3)).astype(np.float32)
        stats("shadow   vs all-tris clusters",
              slab_counts(p0.astype(np.float32), dirs.astype(np.float32), t0, t1s, clo, chi), clo.shape[0])
        stats("shadow   vs small-only clusters",
              slab_counts(p0.astype(np.float32), dirs.astype(np.float32), t0, t1s, slo, shi), slo.shape[0])

    # tile-union stats, scattered GI batch, vs small-only clusters
    say("\ntile-union sizes (GI-scattered, small-only clusters):")
    for tile in (8, 16, 64):
        union_stats("GI-scat", p0.astype(np.float32), dr.astype(np.float32),
                    t0, t1, slo, shi, tile)
    # sorted by direction octant then origin cell
    oct_ = ((dr[:, 0] > 0) * 4 + (dr[:, 1] > 0) * 2 + (dr[:, 2] > 0)).astype(np.int64)
    cell = np.floor((p0 - scene_lo) / span * 8).clip(0, 7).astype(np.int64)
    key = ((oct_ * 8 + cell[:, 0]) * 8 + cell[:, 1]) * 8 + cell[:, 2]
    for tile in (8, 16, 64):
        union_stats("GI-scat", p0.astype(np.float32), dr.astype(np.float32),
                    t0, t1, slo, shi, tile, sort_key=key)


if __name__ == "__main__":
    main()
