"""Round-3 part C: pair-schedule sweep + compact tail windows + anyhit,
at 1M tris.  Run alone (single tunneled chip)."""

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

    for sched in ((2, 4, 8, 16), (4, 8, 16, 16), (8, 16, 16, 16)):
        st._PAIR_SCHEDULE = sched
        st._trace_stream_xla.clear_cache()

        def full_step(o):
            h = st.closest_hit_stream_xla(o, dirs, accel, wb=32)
            return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
        dt = slope(full_step, origins)
        say(f"closest wb=32 pair{sched}: {dt*1e3:7.2f} ms  "
            f"{n/dt/1e6:5.2f} Mrays/s")

    st._PAIR_SCHEDULE = (2, 4, 8, 16)
    st._trace_stream_xla.clear_cache()

    # shadow batch toward a point light (semi-coherent), presorted
    hit = st.closest_hit_stream_xla(origins, dirs, accel, wb=32)
    t = jnp.where(hit.t < 1e29, hit.t, 2.0)
    hp = origins + dirs * (t[:, None] * 0.999)
    light = jnp.asarray([0.0, 3.0, 0.0], jnp.float32)
    toL = light[None, :] - hp
    dist = jnp.linalg.norm(toL, axis=1, keepdims=True)
    sd = toL / dist
    tmax_s = dist[:, 0] - 1e-3
    tmin_s = jnp.broadcast_to(jnp.float32(1e-3), tmax_s.shape)

    def any_step(o):
        occ = st.any_hit_stream_xla(o, sd, accel, tmin_s, tmax_s,
                                    wb=32, presort=True)
        return o + occ[:, None].astype(jnp.float32) * 1e-9
    dt = slope(any_step, hp)
    say(f"anyhit wb=32 presort: {dt*1e3:7.2f} ms  {n/dt/1e6:5.2f} Mrays/s")
    occ = st.any_hit_stream_xla(hp, sd, accel, tmin_s, tmax_s,
                                wb=32, presort=True)
    say(f"occfrac {float(jnp.mean(occ.astype(jnp.float32))):.3f}")

    # segment-cost simulation from the REAL per-ray-culled worklist: for
    # each candidate segmentation factor and pair schedule, rounds(seg) =
    # ceil(max ccnt over the tiles RETIRED in that segment / pair), cost
    # ~ sum(size * rounds * pair) (MT-test units, 64*64 each)
    tmin = jnp.broadcast_to(jnp.float32(1e-4), (n,))
    tmax = jnp.broadcast_to(jnp.float32(1e4), (n,))
    sbid, skey, bcnt, tb = st._block_sort(origins, dirs, tmin, tmax, accel)
    tiles = n // st.TILE
    o = [origins[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
    d = [dirs[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
    rays = (o, d, tmin.reshape(tiles, st.TILE)[..., None],
            tmax.reshape(tiles, st.TILE)[..., None])
    _, _, ccnt = st._cluster_window(sbid, skey, tb, accel, 32, 0, rays)
    cc = np.sort(np.asarray(ccnt))[::-1]      # workload-sorted
    say(f"per-ray-culled clusters/tile mean {cc.mean():.1f} "
        f"p50 {np.percentile(cc, 50):.0f} p90 {np.percentile(cc, 90):.0f} "
        f"p99 {np.percentile(cc, 99):.0f} max {cc.max()}")

    def sim(factor, sched):
        sizes = [tiles]
        while sizes[-1] > factor:
            sizes.append(max(1, sizes[-1] // factor))
        cost, k = 0, 0
        for si, size in enumerate(sizes):
            lower = sizes[si + 1] if si + 1 < len(sizes) else 0
            tier = (0 if size > 2048 else 1 if size > 256 else
                    2 if size > 32 else 3)
            pair = sched[min(tier, len(sched) - 1)]
            # rounds until every tile in [lower, size) is done
            need = int(cc[lower:size].max(initial=0))
            rounds = max(0, -(-max(0, need - k) // pair))
            cost += size * rounds * pair
            k += rounds * pair
        return cost * st.TILE * st.G      # MT tests

    for factor in (4, 2):
        for sched in ((2, 4, 8, 16), (4, 8, 16, 16), (8, 16, 16, 16)):
            say(f"sim factor={factor} sched={sched}: "
                f"{sim(factor, sched)/1e6:.0f}M tests")
    say(f"ideal (sum ccnt): {cc.sum()*st.TILE*st.G/1e6:.0f}M tests")

    # parity spot-check vs brute (compacted-tail correctness on TPU)
    from royaltracer_dx_tpu.ops.intersect import closest_hit_brute
    sub = slice(0, 32768)
    hs = st.closest_hit_stream_xla(origins[sub], dirs[sub], accel, wb=24)
    hb = closest_hit_brute(origins[sub], dirs[sub], tris)
    ok_t = bool(jnp.all(jnp.abs(hs.t - hb.t) <= 0).item())
    ok_i = bool(jnp.all((hs.t > 1e29) | (hs.tri == hb.tri)).item())
    say("parity t:", ok_t, "tri:", ok_i)


if __name__ == "__main__":
    main()
