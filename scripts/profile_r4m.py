"""Round-4 part M: deferred closest epilogue A/B on TPU.

r4l bound: terrain-1M closest runs 15.79 ms full vs 7.68 ms find-only —
the in-round argmin + one-hot u/v extraction is ~half the sweep.  The
"defer" epilogue carries (t, slot) only (min + first-lane select) and
reconstructs u/v once per trace (stream_trace._slot_uv).  This measures
both modes on the windowed path (terrain-1M, 262k coherent rays) and
the flat path (1080p garage primary closest), plus the in-field any-hit
after the occlusion carry slimming (4-tuple -> 1-tuple) to confirm no
regression.

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

    # ---- windowed path: terrain-1M, 262k coherent rays (bench setup)
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

    ref_img = None
    for mode in ("argmin", "defer"):
        stx._CLOSEST_EPILOGUE = mode
        jax.clear_caches()
        # correctness spot check on device
        hit = jax.jit(lambda: stx.closest_hit_stream_xla(
            tuple(origins[:, c] for c in range(3)),
            tuple(dirs[:, c] for c in range(3)), accel))()
        snap = (np.asarray(hit.t), np.asarray(hit.tri),
                np.asarray(hit.u), np.asarray(hit.v))
        if ref_img is None:
            ref_img = snap
        else:
            assert np.array_equal(ref_img[0], snap[0]), "t mismatch"
            assert np.array_equal(ref_img[1], snap[1]), "tri mismatch"
            say(f"  defer vs argmin: t/tri exact, "
                f"max|du|={np.abs(ref_img[2]-snap[2]).max():.2e} "
                f"max|dv|={np.abs(ref_img[3]-snap[3]).max():.2e}")
        dt = slope(closest, (origins, dirs))
        say(f"  terrain closest [{mode:6s}] : {dt*1e3:8.2f} ms "
            f"({n/dt/1e6:6.2f} Mrays/s)")

    # in-field any-hit with the slimmed occlusion carry
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

    dt = slope(anyhit, (p, ldn, tmax_s))
    say(f"  anyhit infield slim-carry  : {dt*1e3:8.2f} ms "
        f"({n/dt/1e6:6.2f} Mrays/s)")

    # ---- flat path: garage primary closest at 1080p
    from royaltracer_dx_tpu.cli import build_scene
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.render import restir_renderer as rr
    scene, cam_g = build_scene("reference")
    r = rr.RestirRenderer(scene, cam_g, RenderConfig(width=64, height=64))
    accel_g = r.scene_arrays.stream
    say(f"garage clusters={accel_g.num_blocks * stx.S}")
    ca = {k: jnp.asarray(vv) for k, vv in
          cam_g.matrices(1920 / 1080).items()}
    og, dg = generate_rays(ca, 1920, 1080)
    order, _ = stx.swizzle_order(1920, 1080, tile_w=8, tile_h=8)
    og = og[jnp.asarray(order)]
    dg = dg[jnp.asarray(order)]
    ng = og.shape[0]

    def closest_g(x, o, d):
        hit = stx.closest_hit_stream_xla(
            tuple(o[:, c] + x * 1e-20 for c in range(3)),
            tuple(d[:, c] for c in range(3)), accel_g)
        return x + (jnp.sum(hit.t[:8]) + jnp.sum(hit.u[:8])) * 1e-12

    for mode in ("argmin", "defer"):
        stx._CLOSEST_EPILOGUE = mode
        jax.clear_caches()
        dt = slope(closest_g, (og, dg))
        say(f"  garage 1080p closest [{mode:6s}] : {dt*1e3:8.2f} ms "
            f"({ng/dt/1e6:6.2f} Mrays/s, {dt/ng*1e9:5.1f} ns/ray)")

    stx._CLOSEST_EPILOGUE = "argmin"


if __name__ == "__main__":
    main()
