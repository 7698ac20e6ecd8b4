"""Round-3 part D: prime+re-cull closest-hit, per-stage cost breakdown,
realistic-occlusion anyhit, warm build.  Run alone (single tunneled chip)."""

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
    say(f"build cold-process {time.perf_counter()-t0:.1f}s "
        f"blocks {accel.num_blocks}")
    # warm build (jit cached): the on-device execution cost
    t0 = time.perf_counter()
    accel = st.build_stream_accel(tris)
    jax.block_until_ready(accel.top_lo)
    say(f"build warm {time.perf_counter()-t0:.2f}s")

    # ---- closest-hit: PRIME_K sweep
    for pk in (4, 8):
        st._PRIME_K = pk
        st._trace_stream_xla.clear_cache()

        def full_step(o):
            h = st.closest_hit_stream_xla(o, dirs, accel, wb=32)
            return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
        dt = slope(full_step, origins)
        say(f"closest wb=32 prime_k={pk}: {dt*1e3:7.2f} ms "
            f"{n/dt/1e6:5.2f} Mrays/s")

    st._PRIME_K = 4
    st._trace_stream_xla.clear_cache()

    # ---- per-stage breakdown (cumulative sub-pipelines, slope-timed)
    tmin = jnp.broadcast_to(jnp.float32(1e-4), (n,))
    tmax = jnp.broadcast_to(jnp.float32(1e4), (n,))
    tiles = n // st.TILE

    def tileize(o):
        oo = [o[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
        dd = [dirs[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
        return (oo, dd, tmin.reshape(tiles, st.TILE)[..., None],
                tmax.reshape(tiles, st.TILE)[..., None])

    def stage_a(o):  # block sort
        sbid, skey, bcnt, tb = st._block_sort(o, dirs, tmin, tmax, accel)
        return o + (skey[:, :1].mean() * 1e-12)

    def stage_b(o):  # + cluster window w/ per-ray cull
        sbid, skey, bcnt, tb = st._block_sort(o, dirs, tmin, tmax, accel)
        rays = tileize(o)
        ccid, centry, ccnt = st._cluster_window(
            sbid, skey, tb, accel, 32, 0, rays)
        return o + (centry[:, :1].mean() * 1e-12)

    def stage_c(o):  # + prime sweep
        sbid, skey, bcnt, tb = st._block_sort(o, dirs, tmin, tmax, accel)
        rays = tileize(o)
        ccid, centry, ccnt = st._cluster_window(
            sbid, skey, tb, accel, 32, 0, rays)
        zero = jnp.zeros((tiles, st.TILE), jnp.float32)
        best = (zero + st.INF, zero.astype(jnp.int32) - 1, zero, zero)
        pk = st._PRIME_K
        best = st._sweep(best, ccid[:, :pk], centry[:, :pk],
                         jnp.minimum(ccnt, pk), rays, accel.cl_flat, False)
        return o + (best[0][:, :1].mean() * 1e-12)

    def stage_d(o):  # + re-cull window
        sbid, skey, bcnt, tb = st._block_sort(o, dirs, tmin, tmax, accel)
        rays = tileize(o)
        ccid, centry, ccnt = st._cluster_window(
            sbid, skey, tb, accel, 32, 0, rays)
        zero = jnp.zeros((tiles, st.TILE), jnp.float32)
        best = (zero + st.INF, zero.astype(jnp.int32) - 1, zero, zero)
        pk = st._PRIME_K
        ccnt_p = jnp.minimum(ccnt, pk)
        best = st._sweep(best, ccid[:, :pk], centry[:, :pk], ccnt_p,
                         rays, accel.cl_flat, False)
        o_t, d_t, tmin_t, tmax_t = rays
        t_tight = jnp.minimum(tmax_t, best[0][..., None])
        rays_t = (o_t, d_t, tmin_t, t_tight)
        live_t = tmax_t[:, :, 0] > tmin_t[:, :, 0]
        t_hi_t = jnp.max(jnp.where(live_t, t_tight[:, :, 0], -st._BIG),
                         axis=1)
        tb_t = tb[:5] + (jnp.minimum(tb[5], t_hi_t),)
        excl = jnp.where(
            jnp.arange(pk, dtype=jnp.int32)[None, :] < ccnt_p[:, None],
            ccid[:, :pk], -1)
        ccid2, centry2, ccnt2 = st._cluster_window(
            sbid, skey, tb_t, accel, 32, 0, rays_t, exclude=excl)
        return o + (centry2[:, :1].mean() * 1e-12), ccnt, ccnt2

    def stage_d_step(o):
        return stage_d(o)[0]

    def stage_e(o):  # full closest
        h = st.closest_hit_stream_xla(o, dirs, accel, wb=32)
        return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9

    names = ["A block-sort", "B +window+cull", "C +prime", "D +re-cull",
             "E full"]
    stages = [stage_a, stage_b, stage_c, stage_d_step, stage_e]
    prev = 0.0
    for name, f in zip(names, stages):
        dt = slope(f, origins)
        say(f"{name:16s} cum {dt*1e3:7.2f} ms  delta {(dt-prev)*1e3:7.2f} ms")
        prev = dt

    # worklist shrink from the re-cull
    _, ccnt, ccnt2 = stage_d(origins)
    c1 = np.asarray(ccnt)
    c2 = np.asarray(ccnt2)
    say(f"worklist clusters/tile: pre mean {c1.mean():.1f} p99 "
        f"{np.percentile(c1, 99):.0f} | post-re-cull mean {c2.mean():.1f} "
        f"p99 {np.percentile(c2, 99):.0f} max {c2.max()}")

    # ---- anyhit with realistic occlusion (light inside the hill field)
    hit = st.closest_hit_stream_xla(origins, dirs, accel, wb=32)
    t = jnp.where(hit.t < 1e29, hit.t, 2.0)
    hp = origins + dirs * (t[:, None] * 0.999)
    for ly in (0.9, 0.5):
        light = jnp.asarray([0.0, ly, 0.0], jnp.float32)
        toL = light[None, :] - hp
        dist = jnp.linalg.norm(toL, axis=1, keepdims=True)
        sd = toL / dist
        tmax_s = dist[:, 0] - 1e-3
        tmin_s = jnp.broadcast_to(jnp.float32(1e-3), tmax_s.shape)

        def any_step(o, sd=sd, tmin_s=tmin_s, tmax_s=tmax_s):
            occ = st.any_hit_stream_xla(o, sd, accel, tmin_s, tmax_s,
                                        wb=32, presort=True)
            return o + occ[:, None].astype(jnp.float32) * 1e-9
        dt = slope(any_step, hp)
        occ = st.any_hit_stream_xla(hp, sd, accel, tmin_s, tmax_s,
                                    wb=32, presort=True)
        of = float(jnp.mean(occ.astype(jnp.float32)))
        say(f"anyhit light_y={ly}: {dt*1e3:7.2f} ms "
            f"{n/dt/1e6:5.2f} Mrays/s occfrac {of:.3f}")

    # ---- parity vs brute (prime+re-cull correctness on TPU)
    from royaltracer_dx_tpu.ops.intersect import closest_hit_brute
    sub = slice(0, 32768)
    hs = st.closest_hit_stream_xla(origins[sub], dirs[sub], accel, wb=32)
    hb = closest_hit_brute(origins[sub], dirs[sub], tris)
    ok_t = bool(jnp.all(jnp.abs(hs.t - hb.t) <= 0).item())
    ok_i = bool(jnp.all((hs.t > 1e29) | (hs.tri == hb.tri)).item())
    say("parity t:", ok_t, "tri:", ok_i)


if __name__ == "__main__":
    main()
