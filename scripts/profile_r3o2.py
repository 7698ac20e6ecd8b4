"""Round-3 part O2 (copy of O with slab-removal tree + easy/hard anyhit): catch-all tail window + find/identify A/B, 1M tris.

After r3g's breakdown (s2 window 5.5 / s3 find 7.9 / s4 identify 7.3 /
s5 28.2 ms => tail+dispatch ~7.5 ms) this measures, on terrain-1M at
512^2 coherent rays:
  closest, find+identify   (the r3g configuration, new catch-all tail)
  closest, single sweep    (_FIND_IDENTIFY=False)
  anyhit presort           (unchanged scheme, new tail)
  parity spot-check vs brute
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

    say("building 1M accel...")
    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])
    t0 = time.perf_counter()
    accel = st.build_stream_accel(tris)
    jax.block_until_ready(accel.top_lo)
    say(f"build {time.perf_counter()-t0:.1f}s blocks {accel.num_blocks}")

    for fi in (False,):
        st._FIND_IDENTIFY = fi
        st._trace_stream_xla.clear_cache()

        def full_step(o):
            h = st.closest_hit_stream_xla(o, dirs, accel, wb=32)
            return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
        dt = slope(full_step, origins)
        say(f"closest wb=32 find_identify={fi}: {dt*1e3:7.2f} ms  "
            f"{n/dt/1e6:5.2f} Mrays/s")
    st._FIND_IDENTIFY = True
    st._trace_stream_xla.clear_cache()

    # shadow batch toward an in-field light (bench.py's 16%-occluded
    # configuration), reversed segments
    hit = st.closest_hit_stream_xla(origins, dirs, accel, wb=32)
    t = jnp.where(hit.t < 1e29, hit.t, 2.0)
    hp = origins + dirs * (t[:, None] * 0.999)
    light = jnp.asarray([0.0, 0.9, 0.0], jnp.float32)
    toL = light[None, :] - hp
    dist = jnp.linalg.norm(toL, axis=1, keepdims=True)
    sd = toL / dist
    tmax_s = dist[:, 0] - 1e-3
    tmin_s = jnp.broadcast_to(jnp.float32(1e-3), tmax_s.shape)

    def any_step(o):
        occ = st.any_hit_stream_xla(o, sd, accel, tmin_s, tmax_s,
                                    wb=32, presort=True, reverse=True)
        return o + occ[:, None].astype(jnp.float32) * 1e-9
    dt = slope(any_step, hp)
    occ = st.any_hit_stream_xla(hp, sd, accel, tmin_s, tmax_s,
                                wb=32, presort=True, reverse=True)
    say(f"anyhit wb=32 presort rev: {dt*1e3:7.2f} ms  {n/dt/1e6:5.2f} "
        f"Mrays/s  occfrac {float(jnp.mean(occ.astype(jnp.float32))):.3f}")


    # easy batch: skylight (light far above — short worklists, ~0%% occ)
    lp2 = jnp.asarray([0.0, 30.0, 0.0], jnp.float32)
    toL2 = lp2[None, :] - hp
    d2 = jnp.linalg.norm(toL2, axis=1, keepdims=True)
    sd2 = toL2 / d2
    tmax2 = d2[:, 0] - 1e-3
    def any_step2(o):
        occ = st.any_hit_stream_xla(o, sd2, accel, tmin_s, tmax2,
                                    wb=32, presort=True, reverse=True)
        return o + occ[:, None].astype(jnp.float32) * 1e-9
    dt2 = slope(any_step2, hp)
    say(f"anyhit skylight: {dt2*1e3:7.2f} ms  {n/dt2/1e6:5.2f} Mrays/s")

    from royaltracer_dx_tpu.ops.intersect import closest_hit_brute
    sub = slice(0, 32768)
    hs = st.closest_hit_stream_xla(origins[sub], dirs[sub], accel, wb=24)
    hb = closest_hit_brute(origins[sub], dirs[sub], tris)
    ok_t = bool(jnp.all(jnp.abs(hs.t - hb.t) <= 0).item())
    ok_i = bool(jnp.all((hs.t > 1e29) | (hs.tri == hb.tri)).item())
    say("parity t:", ok_t, "tri:", ok_i)


if __name__ == "__main__":
    main()
