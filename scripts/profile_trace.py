"""Per-stage cost breakdown of the XLA stream traversal (VERDICT r2 #1).

Times each stage of ops/stream_trace._trace_stream_xla separately on the
real device: top-level block sort, cluster-window build (one-hot box fetch
+ interval cull + lane sort), and the shrinking-prefix MT sweep.  Also
reports worklist statistics (blocks/clusters per tile) so sweep rounds are
interpretable.

Timing: best-of-N wall time around block_until_ready (the ~5 ms tunnel
sync is <10% of every stage measured here; slope-timing individual stages
would need data-dependent chaining that changes what XLA can fuse).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from royaltracer_dx_tpu.camera import Camera, generate_rays
from royaltracer_dx_tpu.ops import stream_trace as st
from royaltracer_dx_tpu.scene.procedural import heightfield, menger_sponge


def timed(f, *args, reps=5):
    r = f(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best, r


def breakdown(name, tris, origins, dirs, t_min=1e-4, t_max=1e4, wb=32):
    n = origins.shape[0]
    out = {"name": name, "tris": int(tris.shape[0]), "rays": int(n)}

    t0 = time.perf_counter()
    accel = st.build_stream_accel(tris)
    jax.block_until_ready(accel.top_lo)
    out["build_s"] = round(time.perf_counter() - t0, 2)
    out["blocks"] = accel.num_blocks

    tmin = jnp.broadcast_to(jnp.float32(t_min), (n,))
    tmax = jnp.broadcast_to(jnp.float32(t_max), (n,))

    # stage 1: block sort
    f_bs = jax.jit(lambda o, d: st._block_sort(o, d, tmin, tmax, accel))
    dt, (sbid, skey, bcnt, tb) = timed(f_bs, origins, dirs)
    out["block_sort_ms"] = round(dt * 1e3, 2)
    out["blocks_per_tile_mean"] = round(float(jnp.mean(bcnt)), 1)
    out["blocks_per_tile_max"] = int(jnp.max(bcnt))

    # stage 2: cluster window 0
    f_cw = jax.jit(lambda sb, sk: st._cluster_window(sb, sk, tb, accel, wb, 0))
    dt, (ccid, centry, ccnt) = timed(f_cw, sbid, skey)
    out["cluster_window_ms"] = round(dt * 1e3, 2)
    out["clusters_per_tile_mean"] = round(float(jnp.mean(ccnt)), 1)
    out["clusters_per_tile_max"] = int(jnp.max(ccnt))

    # stage 3: sweep (closest)
    tiles = n // st.TILE
    o = [origins[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
    d = [dirs[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
    t_min_t = tmin.reshape(tiles, st.TILE)[..., None]
    t_max_t = tmax.reshape(tiles, st.TILE)[..., None]
    rays = (o, d, t_min_t, t_max_t)
    zero = jnp.zeros((tiles, st.TILE), jnp.float32)
    best0 = (zero + st.INF, zero.astype(jnp.int32) - 1, zero, zero)

    f_sw = jax.jit(lambda cc, ce, cn: st._sweep(
        best0, cc, ce, cn, rays, accel.cl_flat, False))
    dt, _ = timed(f_sw, ccid, centry, ccnt)
    out["sweep_ms"] = round(dt * 1e3, 2)

    # full trace
    f_full = jax.jit(lambda o2, d2: st.closest_hit_stream_xla(
        o2, d2, accel, wb=wb).t)
    dt, t_hit = timed(f_full, origins, dirs)
    out["full_ms"] = round(dt * 1e3, 2)
    out["closest_mrays"] = round(n / dt / 1e6, 2)
    out["hit_frac"] = round(float(jnp.mean(jnp.isfinite(t_hit))), 3)

    # any-hit on incoherent point-to-light rays from the hit points
    lp = jnp.asarray([1.5, 4.0, 0.5])
    p = origins + dirs * jnp.minimum(t_hit, 6.0)[:, None]
    ld = lp[None, :] - p
    dist = jnp.linalg.norm(ld, axis=1, keepdims=True)
    ld = ld / jnp.maximum(dist, 1e-6)
    f_any = jax.jit(lambda o2, d2, tm: st.any_hit_stream_xla(
        o2, d2, accel, 1e-3, tm, wb=wb, presort=True))
    dt, _ = timed(f_any, p, ld, dist[:, 0] - 1e-3)
    out["anyhit_mrays"] = round(n / dt / 1e6, 2)
    return out, accel


def main():
    print("device:", jax.devices()[0])
    W = H = 512
    cam = Camera(eye=(2.5, 2.2, 2.5), center=(0.0, 0.0, 0.0))
    ca = {k: jnp.asarray(v) for k, v in cam.matrices(1.0).items()}
    origins, dirs = generate_rays(ca, W, H)
    order, _ = st.swizzle_order(W, H, tile_w=8, tile_h=8)
    origins = jnp.asarray(origins)[jnp.asarray(order)]
    dirs = jnp.asarray(dirs)[jnp.asarray(order)]

    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])
    out, accel = breakdown("terrain_1m", tris, origins, dirs)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
