"""Round-3 part B: compact tail windows + wider occlusion rounds, 1M tris."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401  (persistent compile cache)
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
    say("blocks:", accel.num_blocks)

    for wb in (24, 32):
        def full_step(o, wb=wb):
            h = st.closest_hit_stream_xla(o, dirs, accel, wb=wb)
            return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
        dt = slope(full_step, origins)
        say(f"closest wb={wb}: {dt*1e3:7.2f} ms  {n/dt/1e6:5.2f} Mrays/s")

    # shadow batch: hit points toward a point light, incoherent then presorted
    hit = st.closest_hit_stream_xla(origins, dirs, accel, wb=32)
    t = jnp.where(hit.t < 1e29, hit.t, 2.0)
    hp = origins + dirs * (t[:, None] * 0.999)
    light = jnp.asarray([0.0, 3.0, 0.0], jnp.float32)
    toL = light[None, :] - hp
    dist = jnp.linalg.norm(toL, axis=1, keepdims=True)
    sd = toL / dist
    tmax_s = dist[:, 0] - 1e-3
    for wb in (32,):
        def any_step(o, wb=wb):
            occ = st.any_hit_stream_xla(o, sd, accel,
                                        jnp.float32(1e-3) + 0 * tmax_s,
                                        tmax_s, wb=wb, presort=True)
            return o + occ[:, None].astype(jnp.float32) * 1e-9
        dt = slope(any_step, hp)
        say(f"anyhit wb={wb} presort: {dt*1e3:7.2f} ms  "
            f"{n/dt/1e6:5.2f} Mrays/s")

    # parity spot-check vs brute on a subset (compacted-tail correctness)
    from royaltracer_dx_tpu.ops.intersect import closest_hit_brute
    sub = slice(0, 65536)
    hs = st.closest_hit_stream_xla(origins[sub], dirs[sub], accel, wb=24)
    hb = closest_hit_brute(origins[sub], dirs[sub], tris)
    say("parity t:", bool(jnp.all(jnp.abs(hs.t - hb.t) <= 0).item()),
        "tri:", bool(jnp.all((hs.t > 1e29) | (hs.tri == hb.tri)).item()))


if __name__ == "__main__":
    main()
