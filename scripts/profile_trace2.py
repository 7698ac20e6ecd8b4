"""Slope-timed per-stage breakdown of the real stream-trace stages.

Chains each stage k / 2k times inside one jit with a data dependence
(origin perturbation) so device work cannot be hidden by early syncs.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from royaltracer_dx_tpu.camera import Camera, generate_rays
from royaltracer_dx_tpu.ops import stream_trace as st
from royaltracer_dx_tpu.scene.procedural import heightfield


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
    print("device:", jax.devices()[0])
    W = H = 512
    cam = Camera(eye=(2.5, 2.2, 2.5), center=(0.0, 0.0, 0.0))
    ca = {k: jnp.asarray(v) for k, v in cam.matrices(1.0).items()}
    origins, dirs = generate_rays(ca, W, H)
    order, _ = st.swizzle_order(W, H, tile_w=8, tile_h=8)
    origins = jnp.asarray(origins)[jnp.asarray(order)]
    dirs = jnp.asarray(dirs)[jnp.asarray(order)]
    n = origins.shape[0]

    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])
    accel = st.build_stream_accel(tris)
    jax.block_until_ready(accel.top_lo)
    print("blocks:", accel.num_blocks)

    tmin = jnp.broadcast_to(jnp.float32(1e-4), (n,))
    tmax = jnp.broadcast_to(jnp.float32(1e4), (n,))
    wb = 32

    # full closest trace, chained
    def full_step(o):
        h = st.closest_hit_stream_xla(o, dirs, accel, wb=wb)
        return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
    dt = slope(full_step, origins)
    print(f"full closest : {dt*1e3:.2f} ms  {n/dt/1e6:.2f} Mrays/s")

    # block sort stage, chained
    def bs_step(o):
        sbid, skey, bcnt, tb = st._block_sort(o, dirs, tmin, tmax, accel)
        return o + (skey[:, :1].mean() * 1e-12)
    dt_bs = slope(bs_step, origins)
    print(f"block sort   : {dt_bs*1e3:.2f} ms")

    # block sort + cluster window 0, chained
    def cw_step(o):
        sbid, skey, bcnt, tb = st._block_sort(o, dirs, tmin, tmax, accel)
        ccid, centry, ccnt = st._cluster_window(sbid, skey, tb, accel, wb, 0)
        return o + (centry[:, :1].mean() * 1e-12)
    dt_cw = slope(cw_step, origins)
    print(f"+cluster win : {dt_cw*1e3:.2f} ms  (window = {(dt_cw-dt_bs)*1e3:.2f})")

    # stats
    sbid, skey, bcnt, tb = st._block_sort(origins, dirs, tmin, tmax, accel)
    ccid, centry, ccnt = st._cluster_window(sbid, skey, tb, accel, wb, 0)
    cc = np.asarray(ccnt)
    print(f"clusters/tile mean {cc.mean():.1f} p50 {np.percentile(cc,50):.0f} "
          f"p90 {np.percentile(cc,90):.0f} p99 {np.percentile(cc,99):.0f} "
          f"max {cc.max()}")

    # sweep, chained (rebuild rays from perturbed origins each iter)
    tiles = n // st.TILE
    zero0 = jnp.zeros((tiles, st.TILE), jnp.float32)

    def sweep_step(o):
        oo = [o[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
        dd = [dirs[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
        rays = (oo, dd, tmin.reshape(tiles, st.TILE)[..., None],
                tmax.reshape(tiles, st.TILE)[..., None])
        best0 = (zero0 + st.INF, zero0.astype(jnp.int32) - 1, zero0, zero0)
        best = st._sweep(best0, ccid, centry, ccnt, rays, accel.cl_flat, False)
        return o + jnp.clip(best[0].reshape(n, 1), 0.0, 1.0) * 1e-9
    dt_sw = slope(sweep_step, origins)
    print(f"sweep        : {dt_sw*1e3:.2f} ms")


if __name__ == "__main__":
    main()
