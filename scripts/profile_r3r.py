"""Round-3 part R: TILE and cluster-granularity (G/S) experiments, 1M.

TILE sweep trades frustum tightness (fewer clusters/tile) against round
count + fixed costs; G=32/S=64 trades tighter cluster boxes (fewer MT
tests) against longer worklists and 2x fetch gathers.  Parity-checked.
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
    origins0, dirs0 = generate_rays(ca, W, H)
    n = origins0.shape[0]
    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])

    accel = st.build_stream_accel(tris)
    jax.block_until_ready(accel.top_lo)
    say(f"baseline blocks {accel.num_blocks} (G={st.G}, S={st.S})")

    from royaltracer_dx_tpu.ops.intersect import closest_hit_brute
    hb = closest_hit_brute(origins0[:16384], dirs0[:16384], tris)

    def measure(tag, accel, tile, tw, th):
        st.TILE = tile
        st._trace_stream_xla.clear_cache()
        order, _ = st.swizzle_order(W, H, tile_w=tw, tile_h=th)
        origins = jnp.asarray(origins0)[jnp.asarray(order)]
        dirs = jnp.asarray(dirs0)[jnp.asarray(order)]

        def full_step(o):
            h = st.closest_hit_stream_xla(o, dirs, accel, wb=16)
            return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
        dt = slope(full_step, origins)
        say(f"{tag}: {dt*1e3:7.2f} ms  {n/dt/1e6:5.2f} Mrays/s")

    measure("closest TILE=32 ", accel, 32, 8, 4)
    measure("closest TILE=64 ", accel, 64, 8, 8)
    measure("closest TILE=128", accel, 128, 16, 8)
    st.TILE = 64
    st._trace_stream_xla.clear_cache()

    # cluster granularity: G=32, S=64 (blocks stay 2048 tris)
    st.G, st.S = 32, 64
    st.build_stream_accel.cache_clear() if hasattr(
        st.build_stream_accel, "cache_clear") else None
    try:
        accel32 = st.build_stream_accel(tris)
        jax.block_until_ready(accel32.top_lo)
        say(f"G32 blocks {accel32.num_blocks}")
        hs = st.closest_hit_stream_xla(origins0[:16384], dirs0[:16384],
                                       accel32, wb=16)
        ok_t = bool(jnp.all(jnp.abs(hs.t - hb.t) <= 0).item())
        ok_i = bool(jnp.all((hs.t > 1e29) | (hs.tri == hb.tri)).item())
        say("G32 parity t:", ok_t, "tri:", ok_i)
        measure("closest G=32 TILE=64", accel32, 64, 8, 8)
    except Exception as e:
        say("G32 failed:", repr(e)[:300])
    finally:
        st.G, st.S = 64, 32
        st.TILE = 64
        st._trace_stream_xla.clear_cache()


if __name__ == "__main__":
    main()
