"""Round-3 part G: per-stage cost breakdown of the 1M-tri closest trace
AFTER find+identify and compact tail windows (the BASELINE.md table).

Stages slope-timed on the real terrain-1M data:
  s1  _block_sort (tile frusta + top-level cull + near-to-far block sort)
  s2  _cluster_window w0 (one-hot box fetch + interval slab + per-ray
      cull + packed near-to-far sort)
  s3  find sweep over the window-0 worklist (min-only rounds)
  s4  identify sweep (prefix re-sweep with full epilogue)
  s5  the full trace (everything incl. tail windows + dispatch)
Residual s5 - (s1+s2+s3+s4) ~= tail windows + bookkeeping.
Run alone (single tunneled chip).
"""

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


def slope(step, init, reps=(2, 6)):
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

    # ---- s1: block sort
    def s1(x):
        sbid, skey, bcnt, tb = st._block_sort(
            origins + x * 0.0, dirs, tmin, tmax, accel)
        return x + skey[0, 0] * 1e-12
    say(f"s1 block_sort:      {slope(s1, jnp.float32(0.0))*1e3:7.2f} ms")

    sbid, skey, bcnt, tb = st._block_sort(origins, dirs, tmin, tmax, accel)
    o = [origins[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
    d = [dirs[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
    tmin_t = tmin.reshape(tiles, st.TILE)[..., None]
    tmax_t = tmax.reshape(tiles, st.TILE)[..., None]
    rays = (o, d, tmin_t, tmax_t)
    wb = 32

    # ---- s2: cluster window (w0)
    def s2(x):
        ccid, centry, ccnt = st._cluster_window(
            sbid, skey, tb, accel, wb, 0, rays)
        return x + centry[0, 0] * 1e-12
    say(f"s2 cluster_window:  {slope(s2, jnp.float32(0.0))*1e3:7.2f} ms")

    ccid, centry, ccnt = st._cluster_window(sbid, skey, tb, accel, wb, 0,
                                            rays)
    jax.block_until_ready(ccid)
    best0_t = jnp.full((tiles, st.TILE), st.INF)
    best0 = (best0_t, jnp.zeros((tiles, st.TILE), jnp.int32),
             jnp.zeros((tiles, st.TILE)), jnp.zeros((tiles, st.TILE)))

    # ---- s3: find sweep
    def s3(x):
        bt = st._sweep((best0_t + x * 0.0,), ccid, centry, ccnt, rays,
                       accel.cl_flat, False, find=True)[0]
        return x + bt[0, 0] * 1e-12
    say(f"s3 find sweep:      {slope(s3, jnp.float32(0.0))*1e3:7.2f} ms")

    # ---- s4: identify sweep (uses the real found bt)
    bt = st._sweep((best0_t,), ccid, centry, ccnt, rays,
                   accel.cl_flat, False, find=True)[0]
    bt = jax.block_until_ready(bt)
    improved = bt < st.INF
    bump = jnp.where(improved, bt * (1.0 + 2.0 ** -13) + 1e-30, 0.0)
    rays_id = (o, d, tmin_t, jnp.minimum(tmax_t, bump[..., None]))
    bound = jnp.max(jnp.where(improved, bump, -st._BIG), axis=1)
    ccnt_id = jnp.sum((centry <= bound[:, None]) & (centry < st.INF),
                      axis=1)
    ccnt_id = jnp.minimum(ccnt_id, ccnt)
    say(f"   identify prefix: mean {float(jnp.mean(ccnt_id)):.1f} vs "
        f"find {float(jnp.mean(ccnt)):.1f} clusters/tile")

    def s4(x):
        bb = st._sweep(tuple(b + x * 0.0 if b.dtype != jnp.int32 else b
                             for b in best0),
                       ccid, centry, ccnt_id, rays_id, accel.cl_flat,
                       False)
        return x + bb[0][0, 0] * 1e-12
    say(f"s4 identify sweep:  {slope(s4, jnp.float32(0.0))*1e3:7.2f} ms")

    # ---- s5: full trace
    def s5(x):
        h = st.closest_hit_stream_xla(origins + x * 0.0, dirs, accel,
                                      wb=wb)
        return x + jnp.clip(h.t[0], 0.0, 1.0) * 1e-12
    dt5 = slope(s5, jnp.float32(0.0))
    say(f"s5 full trace:      {dt5*1e3:7.2f} ms  "
        f"({n/dt5/1e6:5.2f} Mrays/s)")


if __name__ == "__main__":
    main()
