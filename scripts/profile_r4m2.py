"""Round-4 part M2: re-A/B the REWRITTEN defer epilogue (argmin-based
lane select, r4m showed the min+eq+where-min chain lowers worse than
XLA's variadic argmin: 20.70 vs 14.84 ms) + occlusion pair-schedule
spot checks on the in-field shadow batch (V#4: target >= 15 Mrays/s).

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
    say(f"terrain tris={tris.shape[0]}")

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
        return x + (jnp.sum(hit.t[:8]) + jnp.sum(hit.u[:8])) * 1e-12

    ref = None
    for mode in ("argmin", "defer"):
        stx._CLOSEST_EPILOGUE = mode
        jax.clear_caches()
        hit = jax.jit(lambda: stx.closest_hit_stream_xla(
            tuple(origins[:, c] for c in range(3)),
            tuple(dirs[:, c] for c in range(3)), accel))()
        snap = (np.asarray(hit.t), np.asarray(hit.tri))
        if ref is None:
            ref = snap
        else:
            nt = int((ref[0] != snap[0]).sum())
            ntri = int((ref[1] != snap[1]).sum())
            say(f"  defer vs argmin: {nt} t ulp-flips, {ntri} tri diffs")
            assert ntri == 0
        dt = slope(closest, (origins, dirs))
        say(f"  terrain closest [{mode:6s}] : {dt*1e3:8.2f} ms "
            f"({n/dt/1e6:6.2f} Mrays/s)")
    stx._CLOSEST_EPILOGUE = "argmin"

    # in-field shadow batch: occlusion pair-schedule spot checks
    t_hit = jax.jit(lambda: stx.closest_hit_stream_xla(
        tuple(origins[:, c] for c in range(3)),
        tuple(dirs[:, c] for c in range(3)), accel).t)()
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

    for sched in ((1, 1, 4, 8), (1, 1, 2, 4), (1, 2, 4, 8), (2, 2, 4, 8),
                  (1, 1, 8, 8)):
        stx._PAIR_SCHEDULE = sched
        jax.clear_caches()
        dt = slope(anyhit, (p, ldn, tmax_s))
        say(f"  anyhit infield sched={sched}: {dt*1e3:8.2f} ms "
            f"({n/dt/1e6:6.2f} Mrays/s)")
    stx._PAIR_SCHEDULE = (1, 1, 4, 8)

    # anyhit wb spot check at the best schedule
    for wb in (8, 16, 32):
        jax.clear_caches()

        def anyhit_wb(x, p, ldn, tmax_s, wb=wb):
            occ = stx.any_hit_stream_xla(
                tuple(p[:, c] + x * 1e-20 for c in range(3)),
                tuple(ldn[:, c] for c in range(3)), accel,
                1e-3, tmax_s, presort=True, wb=wb)
            return x + jnp.sum(occ[:8].astype(jnp.float32)) * 1e-12
        dt = slope(anyhit_wb, (p, ldn, tmax_s))
        say(f"  anyhit infield wb={wb:2d}     : {dt*1e3:8.2f} ms "
            f"({n/dt/1e6:6.2f} Mrays/s)")


if __name__ == "__main__":
    main()
