"""Round-3 part Q: wb + pair-schedule sweep after the per-ray block cull.

The exact block cull shrank worklists (r3o3: closest 22.2 ms); this
measures closest at wb in {8, 16, 32} and the best simulated pair
schedules against the FRESH per-ray-culled worklist distribution.
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

    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])
    accel = st.build_stream_accel(tris)
    jax.block_until_ready(accel.top_lo)
    say(f"blocks {accel.num_blocks}")

    # fresh worklist stats (per-ray block cull + per-ray cluster cull)
    tmin = jnp.broadcast_to(jnp.float32(1e-4), (n,))
    tmax = jnp.broadcast_to(jnp.float32(1e4), (n,))
    tiles = n // st.TILE
    o = [origins[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
    d = [dirs[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
    rays = (o, d, tmin.reshape(tiles, st.TILE)[..., None],
            tmax.reshape(tiles, st.TILE)[..., None])
    sbid, skey, bcnt, tb = st._block_sort(origins, dirs, tmin, tmax,
                                          accel, rays)
    bc = np.asarray(bcnt)
    say(f"blocks/tile mean {bc.mean():.2f} p90 {np.percentile(bc, 90):.0f} "
        f"p99 {np.percentile(bc, 99):.0f} max {bc.max()}")
    _, _, ccnt = st._cluster_window(sbid, skey, tb, accel, 32, 0, rays)
    cc = np.sort(np.asarray(ccnt))[::-1]
    say(f"clusters/tile mean {cc.mean():.1f} p50 {np.percentile(cc, 50):.0f}"
        f" p90 {np.percentile(cc, 90):.0f} p99 {np.percentile(cc, 99):.0f}"
        f" max {cc.max()}")

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
            need = int(cc[lower:size].max(initial=0))
            rounds = max(0, -(-max(0, need - k) // pair))
            cost += size * rounds * pair
            k += rounds * pair
        return cost * st.TILE * st.G

    scheds = [(2, 4, 8, 16), (2, 4, 8, 8), (2, 2, 4, 8), (1, 2, 4, 8),
              (2, 4, 4, 8), (1, 2, 4, 16), (2, 2, 8, 16)]
    for factor in (2, 4):
        for sched in scheds:
            say(f"sim factor={factor} sched={sched}: "
                f"{sim(factor, sched)/1e6:.0f}M tests")
    say(f"ideal (sum ccnt): {cc.sum()*st.TILE*st.G/1e6:.0f}M tests")

    # measure closest at wb sweep (default schedule)
    for wb in (8, 16, 32):
        def full_step(o, wb=wb):
            h = st.closest_hit_stream_xla(o, dirs, accel, wb=wb)
            return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
        dt = slope(full_step, origins)
        say(f"closest wb={wb}: {dt*1e3:7.2f} ms  {n/dt/1e6:5.2f} Mrays/s")

    # measure the top alternative schedule at the best wb
    for sched in ((2, 2, 4, 8), (1, 2, 4, 8)):
        st._PAIR_SCHEDULE = sched
        st._trace_stream_xla.clear_cache()

        def full_step(o):
            h = st.closest_hit_stream_xla(o, dirs, accel, wb=16)
            return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
        dt = slope(full_step, origins)
        say(f"closest wb=16 sched={sched}: {dt*1e3:7.2f} ms  "
            f"{n/dt/1e6:5.2f} Mrays/s")
    st._PAIR_SCHEDULE = (2, 4, 8, 16)


if __name__ == "__main__":
    main()
