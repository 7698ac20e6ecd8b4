"""Round-4 part L: terrain-1M sweep epilogue share + occlusion knobs.

r4g: terrain closest 14.2 ms (18.5 Mrays/s), fetch cost ~0 (fake was
SLOWER); MT floor ~5.3 ms (323M executed tests at the 61G/s VPU rate).
So ~9 ms is per-round overhead: the closest epilogue (argmin + one-hot
u/v extraction + slot mapping), pending, masking, loop.  This script
measures TODAY's epilogue share directly: the same trace in find-only
mode (min-t carry, wrong outputs — timing only) vs the full sweep, plus
occlusion pair-doubling on/off on the in-field shadow batch, and a
pair-schedule spot check.

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
from royaltracer_dx_tpu.ops import stream_trace as stx
from royaltracer_dx_tpu.scene.procedural import heightfield


def say(*a):
    print(*a, flush=True)


def slope(fn, args=(), reps=(1, 3)):
    times = {}
    for k in reps:
        @jax.jit
        def loop(x, a):
            return jax.lax.fori_loop(0, k, lambda i, x: fn(x, *a), x)
        r = loop(jnp.float32(0.0), args)
        np.asarray(r.ravel()[0] if hasattr(r, "ravel") else r)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(jnp.float32(0.0), args)
            np.asarray(r.ravel()[0] if hasattr(r, "ravel") else r)
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = reps
    return (times[k2] - times[k1]) / (k2 - k1)


def main():
    say("device:", jax.devices()[0])
    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])
    accel = stx.build_stream_accel(tris, method="median")
    jax.block_until_ready(accel.blk_tris)
    say(f"tris={tris.shape[0]} blocks={accel.num_blocks}")

    W = H = 512
    cam = Camera(eye=(2.5, 2.2, 2.5), center=(0.0, 0.0, 0.0))
    ca = {k: jnp.asarray(vv) for k, vv in cam.matrices(1.0).items()}
    origins, dirs = generate_rays(ca, W, H)
    order, _ = stx.swizzle_order(W, H, tile_w=8, tile_h=8)
    origins = origins[jnp.asarray(order)]
    dirs = dirs[jnp.asarray(order)]
    n = origins.shape[0]

    def closest(x, o, d):
        hit = stx.closest_hit_stream_xla(
            tuple(o[:, c] + x * 1e-20 for c in range(3)),
            tuple(d[:, c] for c in range(3)), accel)
        return x + jnp.sum(hit.t[:8]) * 1e-12
    dt = slope(closest, (origins, dirs))
    say(f"  closest FULL sweep       : {dt*1e3:8.2f} ms "
        f"({n/dt/1e6:6.2f} Mrays/s)")

    # find-only: swap _sweep_closest for a min-carry-only sweep (wrong
    # outputs; the timing bounds what killing the epilogue could buy)
    real_sc = stx._sweep_closest

    def sweep_find_only(best, ccid, centry, ccnt, rays, cl_flat):
        bt = stx._sweep((best[0],), ccid, centry, ccnt, rays, cl_flat,
                        False, find=True)[0]
        return (bt,) + best[1:]

    stx._sweep_closest = sweep_find_only
    jax.clear_caches()
    dt = slope(closest, (origins, dirs))
    say(f"  closest FIND-only (bound): {dt*1e3:8.2f} ms "
        f"({n/dt/1e6:6.2f} Mrays/s)")
    stx._sweep_closest = real_sc
    jax.clear_caches()

    # in-field shadow batch (bench setup)
    t_hit = stx.closest_hit_stream_xla(
        tuple(origins[:, c] for c in range(3)),
        tuple(dirs[:, c] for c in range(3)), accel).t
    lp = jnp.asarray([0.0, 0.9, 0.0])
    t_s = jnp.where(t_hit < 1e29, t_hit, 2.0)
    p = origins + dirs * (t_s[:, None] * 0.999)
    ld = lp[None, :] - p
    dist = jnp.linalg.norm(ld, axis=1, keepdims=True)
    ldn = ld / jnp.maximum(dist, 1e-6)
    tmax_s = dist[:, 0] - 1e-3

    def anyhit(x, p, ldn, tmax_s):
        occ = stx.any_hit_stream_xla(
            tuple(p[:, c] + x * 1e-20 for c in range(3)),
            tuple(ldn[:, c] for c in range(3)), accel,
            1e-3, tmax_s, presort=True)
        return x + jnp.sum(occ[:8].astype(jnp.float32)) * 1e-12

    for dbl in (True, False):
        stx._OCC_PAIR_DOUBLE = dbl
        jax.clear_caches()
        dt = slope(anyhit, (p, ldn, tmax_s))
        say(f"  anyhit infield dbl={str(dbl):5s} : {dt*1e3:8.2f} ms "
            f"({n/dt/1e6:6.2f} Mrays/s)")
    stx._OCC_PAIR_DOUBLE = True
    jax.clear_caches()

    # closest pair-schedule spot checks
    for sched in ((1, 1, 4, 8), (2, 2, 4, 8), (1, 2, 4, 8)):
        stx._PAIR_SCHEDULE = sched
        jax.clear_caches()
        dt = slope(closest, (origins, dirs))
        say(f"  closest sched={sched}    : {dt*1e3:8.2f} ms "
            f"({n/dt/1e6:6.2f} Mrays/s)")
    stx._PAIR_SCHEDULE = (1, 1, 4, 8)
    jax.clear_caches()


if __name__ == "__main__":
    main()
