"""Round-3 part P: occlusion scheme A/B at 1M tris.

(skylight y=30 | infield y=0.9 light) x (reverse on/off), presort always,
plus closest for the matched-coherence reference row.
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

    hit = st.closest_hit_stream_xla(origins, dirs, accel, wb=32)
    t = jnp.where(hit.t < 1e29, hit.t, 2.0)
    hp = origins + dirs * (t[:, None] * 0.999)
    tmin = jnp.broadcast_to(jnp.float32(1e-3), (n,))

    for name, light in (("skylight", (0.0, 30.0, 0.0)),
                        ("infield", (0.0, 0.9, 0.0))):
        lp = jnp.asarray(light, jnp.float32)
        toL = lp[None, :] - hp
        dist = jnp.linalg.norm(toL, axis=1, keepdims=True)
        sd = toL / dist
        tmax = dist[:, 0] - 1e-3
        for rev in (False, True):
            def any_step(o, sd=sd, tmax=tmax, rev=rev):
                occ = st.any_hit_stream_xla(o, sd, accel, tmin, tmax,
                                            wb=32, presort=True,
                                            reverse=rev)
                return o + occ[:, None].astype(jnp.float32) * 1e-9
            dt = slope(any_step, hp)
            occ = st.any_hit_stream_xla(hp, sd, accel, tmin, tmax,
                                        wb=32, presort=True, reverse=rev)
            say(f"anyhit {name:8s} rev={int(rev)}: {dt*1e3:7.2f} ms "
                f"{n/dt/1e6:5.2f} Mrays/s occ "
                f"{float(jnp.mean(occ.astype(jnp.float32))):.3f}")


if __name__ == "__main__":
    main()
