"""Round-3 profiling: wb sensitivity, window firing, tail-window cost.

Slope-timed (see profile_trace2).  Run alone — single tunneled chip.
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

    # window firing diagnostic: how many tiles still live at each window?
    sbid, skey, bcnt, tb = st._block_sort(origins, dirs, tmin, tmax, accel)
    bc = np.asarray(bcnt)
    print(f"blocks/tile mean {bc.mean():.1f} p50 {np.percentile(bc,50):.0f} "
          f"p90 {np.percentile(bc,90):.0f} p99 {np.percentile(bc,99):.0f} "
          f"max {bc.max()}")

    for wb in (32, 64, 128):
        def full_step(o, wb=wb):
            h = st.closest_hit_stream_xla(o, dirs, accel, wb=wb)
            return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
        dt = slope(full_step, origins)
        print(f"full closest wb={wb:4d}: {dt*1e3:7.2f} ms  "
              f"{n/dt/1e6:5.2f} Mrays/s")

    # after window 0 at wb=64: how many tiles would fire window 1?
    hit = st.closest_hit_stream_xla(origins, dirs, accel, wb=64)
    bt = np.asarray(hit.t).reshape(-1, st.TILE)
    tmax_t = np.asarray(tmax).reshape(-1, st.TILE)
    bound = np.minimum(bt, tmax_t).max(axis=1)
    sk = np.asarray(skey)
    for w0 in (32, 64, 128):
        col = sk[:, min(w0, sk.shape[1] - 1)]
        livew = ((bc > w0) & (col < bound)).sum()
        print(f"tiles live at window start {w0}: {livew} / {bc.shape[0]}")


if __name__ == "__main__":
    main()
