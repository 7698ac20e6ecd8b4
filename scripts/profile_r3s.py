"""Round-3 part S: schedule refinement around (1,2,4,8) at wb=16.

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

    for sched in ((1, 2, 4, 8), (1, 1, 2, 4), (1, 2, 2, 4), (1, 1, 4, 8),
                  (1, 2, 4, 16)):
        st._PAIR_SCHEDULE = sched
        st._trace_stream_xla.clear_cache()

        def full_step(o):
            h = st.closest_hit_stream_xla(o, dirs, accel, wb=16)
            return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
        dt = slope(full_step, origins)
        say(f"closest wb=16 sched={sched}: {dt*1e3:7.2f} ms  "
            f"{n/dt/1e6:5.2f} Mrays/s")

    # best schedule: anyhit on the in-field batch (occlusion pair-doubling
    # makes its effective schedule (2,4,8,16))
    st._PAIR_SCHEDULE = (1, 2, 4, 8)
    st._trace_stream_xla.clear_cache()
    hit = st.closest_hit_stream_xla(origins, dirs, accel, wb=16)
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
                                    wb=16, presort=True)
        return o + occ[:, None].astype(jnp.float32) * 1e-9
    dt = slope(any_step, hp)
    say(f"anyhit infield wb=16 sched(1,2,4,8): {dt*1e3:7.2f} ms  "
        f"{n/dt/1e6:5.2f} Mrays/s")

    def cs_step(o):
        h = st.closest_hit_stream_xla(o, sd, accel, tmin_s, tmax_s, wb=16,
                                      presort=True)
        return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
    dt = slope(cs_step, hp)
    say(f"closest on shadow batch: {dt*1e3:7.2f} ms  {n/dt/1e6:5.2f} Mrays/s")


if __name__ == "__main__":
    main()
