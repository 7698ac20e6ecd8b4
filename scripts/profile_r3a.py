"""Round-3 TPU measurements, part A (output flushed line by line):
  1. MXU matmul-MT vs VPU brute at garage scale (2.2k tris).
  2. Stream trace wb=64 full cost + window-firing diagnostic at 1M tris.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from royaltracer_dx_tpu.camera import Camera, generate_rays
from royaltracer_dx_tpu.ops import mxu_trace as mx
from royaltracer_dx_tpu.ops import stream_trace as st
from royaltracer_dx_tpu.ops.intersect import any_hit_brute, closest_hit_brute
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

    # ---- part 1: garage-scale MXU vs brute ----
    rng = np.random.default_rng(0)
    base = rng.uniform(-1.5, 1.5, (2176, 1, 3))
    tris_small = jnp.asarray(base + rng.uniform(-0.1, 0.1, (2176, 3, 3)),
                             jnp.float32)
    mt = mx.build_mxu_tris(tris_small)
    jax.block_until_ready(mt.coeff)
    say("small scene tris:", tris_small.shape[0], "padded", mt.padded)

    def mxu_step(o):
        h = mx.closest_hit_mxu(o, dirs, mt)
        return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
    dt = slope(mxu_step, origins)
    say(f"mxu closest   : {dt*1e3:7.2f} ms  {dt/n*1e9:6.1f} ns/ray  "
        f"{n/dt/1e6:6.2f} Mrays/s")

    def brute_step(o):
        h = closest_hit_brute(o, dirs, tris_small)
        return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
    dt = slope(brute_step, origins)
    say(f"brute closest : {dt*1e3:7.2f} ms  {dt/n*1e9:6.1f} ns/ray  "
        f"{n/dt/1e6:6.2f} Mrays/s")

    tmin = jnp.broadcast_to(jnp.float32(1e-4), (n,))
    tmax = jnp.broadcast_to(jnp.float32(1e4), (n,))

    def mxu_any(o):
        occ = mx.any_hit_mxu(o, dirs, mt, tmin, tmax)
        return o + occ[:, None].astype(jnp.float32) * 1e-9
    dt = slope(mxu_any, origins)
    say(f"mxu anyhit    : {dt*1e3:7.2f} ms  {dt/n*1e9:6.1f} ns/ray")

    def brute_any(o):
        occ = any_hit_brute(o, dirs, tris_small, tmin, tmax)
        return o + occ[:, None].astype(jnp.float32) * 1e-9
    dt = slope(brute_any, origins)
    say(f"brute anyhit  : {dt*1e3:7.2f} ms  {dt/n*1e9:6.1f} ns/ray")

    # TPU-vs-oracle agreement (catches precision trouble on real HW)
    hm = mx.closest_hit_mxu(origins, dirs, mt)
    hb = closest_hit_brute(origins, dirs, tris_small)
    mh = np.asarray(hm.t) < 1e29
    bh = np.asarray(hb.t) < 1e29
    both = mh & bh
    dtv = np.abs(np.asarray(hm.t)[both] - np.asarray(hb.t)[both])
    say(f"agree state {np.mean(mh == bh):.6f}  same-tri "
        f"{(np.asarray(hm.tri)[both] == np.asarray(hb.tri)[both]).mean():.6f}"
        f"  max|dt| {dtv.max() if both.any() else 0:.2e}")

    # ---- part 2: 1M-tri stream, wb=64 ----
    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])
    accel = st.build_stream_accel(tris)
    jax.block_until_ready(accel.top_lo)
    say("blocks:", accel.num_blocks)

    def full_step(o):
        h = st.closest_hit_stream_xla(o, dirs, accel, wb=64)
        return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
    dt = slope(full_step, origins)
    say(f"stream closest wb=64: {dt*1e3:7.2f} ms  {n/dt/1e6:5.2f} Mrays/s")

    sbid, skey, bcnt, tb = st._block_sort(origins, dirs, tmin, tmax, accel)
    bc = np.asarray(bcnt)
    say(f"blocks/tile mean {bc.mean():.1f} p50 {np.percentile(bc, 50):.0f} "
        f"p90 {np.percentile(bc, 90):.0f} p99 {np.percentile(bc, 99):.0f} "
        f"max {bc.max()}")
    hit = st.closest_hit_stream_xla(origins, dirs, accel, wb=64)
    bt = np.asarray(hit.t).reshape(-1, st.TILE)
    bound = np.minimum(bt, np.asarray(tmax).reshape(-1, st.TILE)).max(axis=1)
    sk = np.asarray(skey)
    for w0 in (32, 64, 128):
        col = sk[:, min(w0, sk.shape[1] - 1)]
        livew = int(((bc > w0) & (col < bound)).sum())
        say(f"tiles live at window start {w0}: {livew} / {bc.shape[0]}")


if __name__ == "__main__":
    main()
