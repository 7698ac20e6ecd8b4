"""Round-4 part G: terrain-1M sweep fetch-cost decomposition.

Hypothesis: the windowed sweep's per-round cluster-row fetch (XLA row
gather at ~136 ns/row x ~80k executed visits) is most of the gap between
the 16.4 ms measured terrain-1M closest trace and its ~6 ms MT-test
floor.  Measures: (1) a gather microbench across row widths/counts and
table sizes, (2) terrain closest/any-hit with fetch mode {gather (ship),
fake (fetch removed — wrong results, timing only)}, (3) executed-visit
counts, (4) the same for the in-field occlusion batch (VERDICT #4).

Run alone (single tunneled chip).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401
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


def gather_microbench():
    say("\n=== gather microbench (random row gathers) ===")
    for rows_tab, width in ((16384, 576), (16384, 144), (16384, 64),
                            (2048, 576), (131072, 576)):
        tab = jax.random.normal(jax.random.PRNGKey(0), (rows_tab, width))
        for n_idx in (4096, 65536):
            idx = jax.random.randint(jax.random.PRNGKey(1), (n_idx,), 0,
                                     rows_tab)

            def f(x):
                ii = (idx + x.astype(jnp.int32) * 0) % rows_tab
                return x + jnp.sum(tab[ii][:, :4]) * 1e-12
            dt = slope(f)
            say(f"  table [{rows_tab:6d},{width:3d}] "
                f"({width*4:5d} B rows), {n_idx:6d} rows/call: "
                f"{dt*1e6:9.1f} us  ({dt/n_idx*1e9:7.1f} ns/row, "
                f"{n_idx*width*4/dt/1e9:6.1f} GB/s)")


def terrain():
    """EXACTLY bench.py's terrain setup (camera, swizzle, shadow batch)."""
    from royaltracer_dx_tpu.camera import Camera, generate_rays

    say("\n=== terrain-1M closest / any-hit, fetch A/B (bench setup) ===")
    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])
    say(f"tris={tris.shape[0]}")
    accel = stx.build_stream_accel(tris, method="median")
    jax.block_until_ready(accel.blk_tris)
    say(f"blocks={accel.num_blocks} clusters={accel.num_blocks * stx.S}")

    W = H = 512
    cam = Camera(eye=(2.5, 2.2, 2.5), center=(0.0, 0.0, 0.0))
    ca = {k: jnp.asarray(vv) for k, vv in cam.matrices(1.0).items()}
    origins, dirs = generate_rays(ca, W, H)
    order, _ = stx.swizzle_order(W, H, tile_w=8, tile_h=8)
    origins = origins[jnp.asarray(order)]
    dirs = dirs[jnp.asarray(order)]
    n = origins.shape[0]

    for mode in (None, "fake"):
        stx._FETCH_MODE = mode
        jax.clear_caches()

        def f(x):
            hit = stx.closest_hit_stream_xla(
                origins + x * 1e-20, dirs, accel)
            return x + jnp.sum(hit.t[:8]) * 1e-12
        dt = slope(f)
        say(f"  closest fetch={str(mode):6s}: {dt*1e3:8.2f} ms "
            f"({n/dt/1e6:6.2f} Mrays/s)")

    # bench's in-field shadow batch
    stx._FETCH_MODE = None
    jax.clear_caches()
    t_hit = stx.closest_hit_stream_xla(origins, dirs, accel).t
    lp = jnp.asarray([0.0, 0.9, 0.0])
    t_s = jnp.where(t_hit < 1e29, t_hit, 2.0)
    p = origins + dirs * (t_s[:, None] * 0.999)
    ld = lp[None, :] - p
    dist = jnp.linalg.norm(ld, axis=1, keepdims=True)
    ld = ld / jnp.maximum(dist, 1e-6)
    tmax_s = dist[:, 0] - 1e-3

    for mode in (None, "fake"):
        stx._FETCH_MODE = mode
        jax.clear_caches()

        def fo(x):
            occ = stx.any_hit_stream_xla(p + x * 1e-20, ld, accel,
                                         1e-3, tmax_s, presort=True)
            return x + jnp.sum(occ[:8].astype(jnp.float32)) * 1e-12
        dt = slope(fo)
        say(f"  anyhit infield fetch={str(mode):6s}: {dt*1e3:8.2f} ms "
            f"({n/dt/1e6:6.2f} Mrays/s)")
    stx._FETCH_MODE = None
    occf = np.asarray(stx.any_hit_stream_xla(p, ld, accel, 1e-3, tmax_s,
                                             presort=True))
    say(f"  infield occluded fraction: {occf.mean():.3f}")


def main():
    say("device:", jax.devices()[0])
    # gather_microbench() crashed the remote compile service (HTTP 413
    # at the 131072-row table) and its small-slope numbers were noise
    # dominated; the terrain A/B below answers the actual question.
    terrain()


if __name__ == "__main__":
    main()
