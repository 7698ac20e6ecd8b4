"""Round-3 part F: where does the sweep's per-round cost go?

Components slope-timed on the real terrain-1M window data:
  g1  one bulk gather of the first-C worklist cluster rows (prefetch)
  g2  per-round pair gathers as the sweep does today (8 rounds worth)
  m1  one full closest-hit round on fixed rows (MT + argmin + u/v + slot)
  m2  same without the u/v one-hot extraction
  m3  occlusion-style round (MT + any)
Run alone (single tunneled chip)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401
from royaltracer_dx_tpu.camera import Camera, generate_rays
from royaltracer_dx_tpu.ops import stream_trace as st
from royaltracer_dx_tpu.scene.procedural import heightfield


def say(*a):
    print(*a, flush=True)


def slope(step, init, reps=(2, 8)):
    times = {}
    for k in reps:
        @jax.jit
        def loop(c):
            return jax.lax.fori_loop(0, k, lambda i, c: step(c), c)
        r = loop(init)
        np.asarray(jax.tree.leaves(r)[0].ravel()[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(init)
            np.asarray(jax.tree.leaves(r)[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = reps
    return (times[k2] - times[k1]) / (k2 - k1)


def main():
    say("device:", jax.devices()[0])
    W = H = 512
    cam = Camera(eye=(2.5, 2.2, 2.5), center=(0.0, 0.0, 0.0))
    ca = {k: jnp.asarray(v) for k, v in cam.matrices(1.0).items()}
    origins, dirs = generate_rays(ca, W, H)
    order, _ = st.swizzle_order(W, H, tile_w=8, tile_h=8)
    origins = jnp.asarray(origins)[jnp.asarray(order)]
    dirs = jnp.asarray(dirs)[jnp.asarray(order)]
    n = origins.shape[0]
    tiles = n // st.TILE

    say("building 1M accel...")
    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])
    t0 = time.perf_counter()
    accel = st.build_stream_accel(tris)
    jax.block_until_ready(accel.top_lo)
    say(f"build {time.perf_counter()-t0:.1f}s blocks {accel.num_blocks}")

    tmin = jnp.broadcast_to(jnp.float32(1e-4), (n,))
    tmax = jnp.broadcast_to(jnp.float32(1e4), (n,))

    @jax.jit
    def window(o):
        sbid, skey, bcnt, tb = st._block_sort(o, dirs, tmin, tmax, accel)
        oo = [o[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
        dd = [dirs[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
        rays = (oo, dd, tmin.reshape(tiles, st.TILE)[..., None],
                tmax.reshape(tiles, st.TILE)[..., None])
        ccid, centry, ccnt = st._cluster_window(
            sbid, skey, tb, accel, 32, 0, rays)
        return ccid, centry, ccnt

    ccid, centry, ccnt = window(origins)
    jax.block_until_ready(ccid)
    o = [origins[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
    d = [dirs[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
    tmin_t = tmin.reshape(tiles, st.TILE)[..., None]
    tmax_t = tmax.reshape(tiles, st.TILE)[..., None]
    cl_flat = accel.cl_flat
    C = 16
    G = st.G

    # ---- g1: bulk prefetch of the first-C rows per tile
    def g1(x):
        rows = cl_flat[ccid[:, :C].reshape(-1)]       # [tiles*C, 9G]
        return x + rows[0, 0] * 1e-12
    say(f"g1 bulk gather {tiles}x{C} rows: "
        f"{slope(g1, jnp.float32(0.0))*1e3:7.2f} ms")

    # ---- g2: 8 rounds of pair=2 gathers (the sweep's current fetch)
    def g2(x):
        acc = x
        for k in range(0, 16, 2):
            rows = cl_flat[ccid[:, k:k + 2].reshape(-1)]
            acc = acc + rows[0, 0] * 1e-12
        return acc
    say(f"g2 8x pair-2 gathers:        "
        f"{slope(g2, jnp.float32(0.0))*1e3:7.2f} ms")

    # fixed prefetched rows for the MT-round variants
    rows16 = cl_flat[ccid[:, :C].reshape(-1)].reshape(tiles, C, 9, G)
    rows16 = jax.block_until_ready(rows16)
    lane = jax.lax.iota(jnp.int32, 2 * G)[None, None, :]

    def mt_round(x, mode, k):
        p = [rows16[:, k:k + 2, kk, :].reshape(tiles, 1, 2 * G)
             for kk in range(9)]
        cut = jnp.minimum(x[..., None], tmax_t)
        t, u, v = st._mt_planes(o, d, p, tmin_t, cut)
        if mode == "occl":
            hit = jnp.any(t < st.INF, axis=-1)
            return jnp.where(hit, 0.0, x)
        t_c = jnp.min(t, axis=-1)
        if mode == "no_uv":
            idx = jnp.argmin(t, axis=-1)
            better = t_c < x
            return jnp.where(better, t_c, x) + idx.astype(jnp.float32) * 0.0
        idx = jnp.argmin(t, axis=-1)
        hot = idx[..., None] == lane
        u_c = jnp.sum(jnp.where(hot, u, 0.0), axis=-1)
        v_c = jnp.sum(jnp.where(hot, v, 0.0), axis=-1)
        slot = idx
        for j in range(2):
            in_j = (idx >= j * G) & (idx < (j + 1) * G)
            slot = jnp.where(in_j, ccid[:, k + j:k + j + 1] * G
                             + idx - j * G, slot)
        better = t_c < x
        return (jnp.where(better, t_c, x)
                + (u_c + v_c + slot.astype(jnp.float32)) * 0.0)

    zero = jnp.zeros((tiles, st.TILE), jnp.float32) + st.INF
    for mode in ("full", "no_uv", "occl"):
        def f(x, mode=mode):
            acc = x
            for k in range(0, 16, 2):
                acc = mt_round(acc, mode, k)
            return acc
        dt = slope(f, zero) / 8.0
        say(f"m {mode:6s} per round [4096,64,128]: {dt*1e3:7.3f} ms "
            f"({4096*64*128/dt/1e9:6.1f} G tests/s)")

    # worklist stats for context
    c = np.asarray(ccnt)
    say(f"worklist clusters/tile mean {c.mean():.1f} p50 "
        f"{np.percentile(c, 50):.0f} p75 {np.percentile(c, 75):.0f} "
        f"p90 {np.percentile(c, 90):.0f} p99 {np.percentile(c, 99):.0f} "
        f"max {c.max()}  frac>16 {float((c > 16).mean()):.3f}")


if __name__ == "__main__":
    main()
