"""Round-3 part T: brute vs flat-stream crossover in ray count (garage).

r3m showed flat-stream beating brute at 2.07M scattered rays (26.8 vs
36.6 ns/ray) but the 256^2/96^2 bench rows regressed when scattered
batches moved to the stream path — the flat machinery has fixed costs
that only amortize at large N.  Measures both paths at N in
{16k, 65k, 262k, 1M, 2M} scattered rays on the reference scene.
Run alone (single tunneled chip)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401
from royaltracer_dx_tpu.cli import build_scene
from royaltracer_dx_tpu.config import RenderConfig
from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer
from royaltracer_dx_tpu.ops import stream_trace as st
from royaltracer_dx_tpu.ops.intersect import any_hit_brute, closest_hit_brute


def say(*a):
    print(*a, flush=True)


def slope(step, init, reps=(2, 8)):
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
    scene, camera = build_scene("reference")
    r = RestirRenderer(scene, camera, RenderConfig(width=64, height=64))
    sa = r.scene_arrays
    tris = sa.tri_verts
    accel = sa.stream
    say(f"tris {tris.shape[0]} clusters {accel.num_blocks * st.S}")

    rng = np.random.default_rng(3)
    NMAX = 1 << 21
    o_all = jnp.asarray(rng.uniform(-1.5, 1.5, (NMAX, 3)), jnp.float32)
    d_all = jnp.asarray(rng.normal(size=(NMAX, 3)), jnp.float32)
    d_all = d_all / jnp.linalg.norm(d_all, axis=1, keepdims=True)

    for n in (1 << 14, 1 << 16, 1 << 18, 1 << 20, 1 << 21):
        o, d = o_all[:n], d_all[:n]

        def brute_step(x):
            h = closest_hit_brute(o + x * 0.0, d, tris)
            return x + jnp.clip(h.t[0], 0.0, 1.0) * 1e-12
        dtb = slope(brute_step, jnp.float32(0.0))

        def flat_step(x):
            h = st.closest_hit_stream_xla(o + x * 0.0, d, accel)
            return x + jnp.clip(h.t[0], 0.0, 1.0) * 1e-12
        dtf = slope(flat_step, jnp.float32(0.0))
        say(f"N={n:8d}: brute {dtb*1e3:7.2f} ms ({dtb/n*1e9:5.1f} ns/ray)  "
            f"flat {dtf*1e3:7.2f} ms ({dtf/n*1e9:5.1f} ns/ray)")

        tmin = jnp.full((n,), 1e-3)
        tmax = jnp.full((n,), 2.0)

        def bruteo_step(x):
            occ = any_hit_brute(o + x * 0.0, d, tris, tmin, tmax)
            return x + occ[0].astype(jnp.float32) * 1e-12
        dtb = slope(bruteo_step, jnp.float32(0.0))

        def flato_step(x):
            occ = st.any_hit_stream_xla(o + x * 0.0, d, accel, tmin, tmax)
            return x + occ[0].astype(jnp.float32) * 1e-12
        dtf = slope(flato_step, jnp.float32(0.0))
        say(f"            anyhit brute {dtb*1e3:7.2f} ms "
            f"({dtb/n*1e9:5.1f} ns/ray)  flat {dtf*1e3:7.2f} ms "
            f"({dtf/n*1e9:5.1f} ns/ray)")


if __name__ == "__main__":
    main()
