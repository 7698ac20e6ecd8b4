"""Round-4 part V: worklist-SIGNATURE ray presort A/B at terrain-1M.

VERDICT r3 #3: the sweep executes 323-327M MT tests vs 214M in exact
per-ray worklists — the lock-step TILE=64 pays the union of its rays'
cluster lists.  Tiles are consecutive 64-ray groups in caller order, so
re-grouping rays by a worklist signature is a pure input permutation.

Orders measured (closest on swizzled camera rays; any-hit on the bench's
in-field shadow batch):
  base   — the bench's order (swizzle for camera, coherence_order for
           shadow via presort=True)
  sig    — per-ray (first-overlapped-block, n-blocks, morton) packed key:
           rays that start in the same block with similar worklist sizes
           share tiles
  sigc   — (first block, morton) — spatial tie-break only

Also reports the window-0 ccnt sum (the tile-union worklist size the
sweep actually pays) per order as a noise-free quality proxy.

Run alone (single tunneled chip).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401
from royaltracer_dx_tpu.camera import Camera, generate_rays
from royaltracer_dx_tpu.ops import stream_trace as st
from royaltracer_dx_tpu.ops.bvh import morton_codes
from royaltracer_dx_tpu.scene.procedural import heightfield


def say(*a):
    print(*a, flush=True)


def slope(step, init, reps=(2, 6)):
    times = {}
    for k in reps:
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, k, lambda i, x: step(x), x)
        r = loop(init)
        np.asarray(jax.device_get(r.ravel()[0]))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(init)
            np.asarray(jax.device_get(r.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = reps
    return (times[k2] - times[k1]) / (k2 - k1)


@functools.partial(jax.jit, static_argnames=("with_cnt",))
def sig_order(o, d, t_min, t_max, top_lo, top_hi, lo, hi, with_cnt):
    """Packed signature sort key: (first block, [n-blocks,] morton)."""
    n = o[0].shape[0]
    b = top_lo.shape[0]
    tn = jnp.broadcast_to(
        jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))[:, None],
        (n, b))
    tf = jnp.broadcast_to(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))[:, None],
        (n, b))
    for c in range(3):
        inv = st._safe_inv(d[c])[:, None]
        t0 = (top_lo[None, :, c] - o[c][:, None]) * inv
        t1 = (top_hi[None, :, c] - o[c][:, None]) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    ok = tn <= tf
    entry = jnp.where(ok, jnp.maximum(tn, 0.0), st.INF)
    first = jnp.argmin(entry, axis=1).astype(jnp.int32)       # [N]
    cnt = jnp.sum(ok.astype(jnp.int32), axis=1)
    step = 0.25 * jnp.max(hi - lo)
    pt = jnp.stack([o[c] + d[c] * step for c in range(3)], axis=-1)
    mk = morton_codes(pt, lo, hi)
    if with_cnt:
        key = ((first.astype(jnp.uint32) << 21)
               | (jnp.minimum(cnt, 511).astype(jnp.uint32) << 12)
               | (mk >> 20))
    else:
        key = (first.astype(jnp.uint32) << 21) | (mk >> 11)
    return jnp.argsort(key).astype(jnp.int32)


def wl_stats(o, d, t_min, t_max, accel, wb=16):
    n = o[0].shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tiles = n // st.TILE
    ot = [c.reshape(tiles, st.TILE)[..., None] for c in o]
    dt = [c.reshape(tiles, st.TILE)[..., None] for c in d]
    rays = (ot, dt, t_min.reshape(tiles, st.TILE)[..., None],
            t_max.reshape(tiles, st.TILE)[..., None])
    sbid, skey, bcnt, tb = st._block_sort(o, d, t_min, t_max, accel, rays)
    _, _, ccnt = st._cluster_window(sbid, skey, tb, accel, wb, 0, rays)
    return (float(jnp.sum(bcnt)) / tiles, float(jnp.sum(ccnt)) / tiles,
            float(jnp.sum(ccnt)) * st.TILE * st.G / 1e6)


def main():
    say("device:", jax.devices()[0])
    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])
    accel = st.build_stream_accel(tris)
    jax.block_until_ready(accel.top_lo)
    say(f"terrain {tris.shape[0]} tris, {accel.num_blocks} blocks")
    lo = jnp.min(accel.top_lo, axis=0)
    hi = jnp.max(accel.top_hi, axis=0)

    W = H = 512
    cam = Camera(eye=(2.5, 2.2, 2.5), center=(0.0, 0.0, 0.0))
    ca = {k: jnp.asarray(vv) for k, vv in cam.matrices(1.0).items()}
    origins, dirs = generate_rays(ca, W, H)
    order, _ = st.swizzle_order(W, H, tile_w=8, tile_h=8)
    origins = origins[jnp.asarray(order)]
    dirs = dirs[jnp.asarray(order)]
    n = origins.shape[0]
    oc = tuple(origins[:, c] for c in range(3))
    dc = tuple(dirs[:, c] for c in range(3))

    # shadow batch (bench terrain row setup)
    t_hit = st.closest_hit_stream_xla(oc, dc, accel).t
    lp = jnp.asarray([0.0, 0.9, 0.0])
    t_s = jnp.where(t_hit < 1e29, t_hit, 2.0)
    p = origins + dirs * (t_s[:, None] * 0.999)
    ld = lp[None, :] - p
    dist = jnp.linalg.norm(ld, axis=1, keepdims=True)
    ld = ld / jnp.maximum(dist, 1e-6)
    tmax_s = dist[:, 0] - 1e-3
    pc = tuple(p[:, c] for c in range(3))
    lc = tuple(ld[:, c] for c in range(3))

    def perm3(cols, pm):
        return tuple(c[pm] for c in cols)

    # camera-ray orders
    cam_orders = {"base(swizzle)": None}
    cam_orders["sig"] = sig_order(oc, dc, 1e-4, 1e4, accel.top_lo,
                                  accel.top_hi, lo, hi, True)
    cam_orders["sigc"] = sig_order(oc, dc, 1e-4, 1e4, accel.top_lo,
                                   accel.top_hi, lo, hi, False)
    say("== closest, camera rays ==")
    for name, pm in cam_orders.items():
        o2, d2 = (oc, dc) if pm is None else (perm3(oc, pm), perm3(dc, pm))
        bpt, cpt, mt = wl_stats(o2, d2, 1e-4, 1e4, accel)
        def step(x, o2=o2, d2=d2):
            h = st.closest_hit_stream_xla(
                tuple(c + x * 1e-30 for c in o2), d2, accel)
            return x + jnp.sum(jnp.minimum(h.t, 1.0)) * 1e-12
        dt_s = slope(step, jnp.float32(0.0))
        say(f"  {name:14s}: {dt_s*1e3:7.2f} ms  {n/dt_s/1e6:6.2f} Mrays/s"
            f"   blocks/tile {bpt:5.1f} clusters/tile {cpt:6.1f}"
            f" w0-tests {mt:6.0f}M")

    # shadow-batch orders (bench uses presort=True = coherence_order)
    sh_orders = {}
    sh_orders["coherence(base)"] = st.coherence_order(pc, lc, accel)[0]
    sh_orders["sig"] = sig_order(pc, lc, 1e-3, tmax_s, accel.top_lo,
                                 accel.top_hi, lo, hi, True)
    sh_orders["sigc"] = sig_order(pc, lc, 1e-3, tmax_s, accel.top_lo,
                                  accel.top_hi, lo, hi, False)
    say("== any-hit, in-field shadow batch ==")
    occ_ref = None
    for name, pm in sh_orders.items():
        o2, l2 = perm3(pc, pm), perm3(lc, pm)
        tm2 = tmax_s[pm]
        bpt, cpt, mt = wl_stats(o2, l2, 1e-3, tm2, accel)
        def step(x, o2=o2, l2=l2, tm2=tm2):
            occ = st.any_hit_stream_xla(
                tuple(c + x * 1e-30 for c in o2), l2, accel, 1e-3, tm2)
            return x + jnp.sum(occ.astype(jnp.float32)) * 1e-12
        dt_s = slope(step, jnp.float32(0.0))
        occ = np.zeros(n, bool)
        occ[np.asarray(pm)] = np.asarray(
            st.any_hit_stream_xla(o2, l2, accel, 1e-3, tm2))
        if occ_ref is None:
            occ_ref = occ
        say(f"  {name:14s}: {dt_s*1e3:7.2f} ms  {n/dt_s/1e6:6.2f} Mrays/s"
            f"   blocks/tile {bpt:5.1f} clusters/tile {cpt:6.1f}"
            f" w0-tests {mt:6.0f}M  match={bool((occ == occ_ref).all())}")


if __name__ == "__main__":
    main()
