"""Round-4 part X: flat-path A/B at the garage (2.2k tris, 35 clusters).

Measures ns/ray on 1080p-scale batches through the FLAT trace path:
  - primary camera rays (closest)
  - in-scene shadow segments surface -> light point (any-hit): the
    pass-3 visibility workload shape
across {slab cull ON / OFF} x {pair schedule (1,1,4,8) / (2,2,4,8)}.

Slab OFF = the per-cluster thick-plane half-widths patched to +BIG
(every crossing test passes -> bit-identical to the pre-slab trace).
pair=2 at tier 0 fills the full 128-lane VPU row; the terrain sweep
chose pair=1 (r3s), but the flat path's unions may differ.

Also reports the tile-union cluster count (sum ccnt) per config — the
work the sweep actually pays.

Run alone (single tunneled chip).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401
from royaltracer_dx_tpu.camera import generate_rays
from royaltracer_dx_tpu.cli import build_scene
from royaltracer_dx_tpu.ops import stream_trace as st


def say(*a):
    print(*a, flush=True)


def slope(step, init, reps=(2, 6)):
    times = {}
    for k in reps:
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, k, lambda i, x: step(x), x)
        r = loop(init)
        np.asarray(jax.device_get(r.ravel()[0]))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(init)
            np.asarray(jax.device_get(r.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = reps
    return (times[k2] - times[k1]) / (k2 - k1)


def union_stats(o, d, t_min, t_max, accel):
    n = o[0].shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tiles = n // st.TILE
    ot = [c.reshape(tiles, st.TILE)[..., None] for c in o]
    dt = [c.reshape(tiles, st.TILE)[..., None] for c in d]
    rays = (ot, dt, t_min.reshape(tiles, st.TILE)[..., None],
            t_max.reshape(tiles, st.TILE)[..., None])
    b = accel.num_blocks
    boxes = jnp.broadcast_to(accel.blk_boxes[None, :, :, :st.S],
                             (tiles, b, 6, st.S))
    planes = jnp.broadcast_to(accel.blk_planes[None, :, :, :st.S],
                              (tiles, b, 5, st.S))
    rpass, _ = st._per_ray_box_cull(rays, boxes, planes)
    return float(jnp.sum(rpass.astype(jnp.int32))) / tiles


def main():
    say("device:", jax.devices()[0])
    scene, camera = build_scene("reference")
    flat = scene.flatten()
    accel = st.build_stream_accel(flat.tri_verts)
    jax.block_until_ready(accel.top_lo)
    n_tris = flat.tri_verts.shape[0]
    say(f"garage {n_tris} tris, {accel.num_blocks} blocks "
        f"({accel.num_blocks * st.S} cluster slots)")

    W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1920, 1080)
    ca = {k: jnp.asarray(v) for k, v in camera.matrices(W / H).items()}
    origins, dirs = generate_rays(ca, W, H)
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    n = origins.shape[0]
    oc = tuple(origins[:, c] for c in range(3))
    dc = tuple(dirs[:, c] for c in range(3))

    hit = st.closest_hit_stream_xla(oc, dc, accel)
    t_s = jnp.where(hit.t < 1e29, hit.t, 4.0)
    p = origins + dirs * (t_s[:, None] * 0.999)
    lp = jnp.asarray([0.0, 2.6, 0.0])          # overhead light region
    ld = lp[None, :] - p
    dist = jnp.linalg.norm(ld, axis=1, keepdims=True)
    ld = ld / jnp.maximum(dist, 1e-6)
    tmax_s = dist[:, 0] - 1e-3
    pc = tuple(p[:, c] for c in range(3))
    lc = tuple(ld[:, c] for c in range(3))

    say(f"union clusters/tile: primary {union_stats(oc, dc, 1e-4, 1e4, accel):.1f}"
        f"  shadow {union_stats(pc, lc, 1e-3, tmax_s, accel):.1f}")

    real_h = accel.blk_planes
    no_slab = real_h.at[:, 4, :].set(st._BIG)   # every crossing test passes

    schedules = {"pair(1,1,4,8)": (1, 1, 4, 8), "pair(2,2,4,8)": (2, 2, 4, 8)}
    old_sched = st._PAIR_SCHEDULE
    occ_ref = None
    t_ref = None
    for slab_on in (True, False):
        acc2 = accel.replace(blk_planes=real_h if slab_on else no_slab)
        for sname, sched in schedules.items():
            st._PAIR_SCHEDULE = sched
            jax.clear_caches()

            def stepc(x):
                h = st.closest_hit_stream_xla(
                    tuple(c + x * 1e-30 for c in oc), dc, acc2)
                return x + jnp.sum(jnp.minimum(h.t, 1.0)) * 1e-12
            dt_c = slope(stepc, jnp.float32(0.0))

            def stepo(x):
                occ = st.any_hit_stream_xla(
                    tuple(c + x * 1e-30 for c in pc), lc, acc2, 1e-3, tmax_s)
                return x + jnp.sum(occ.astype(jnp.float32)) * 1e-12
            dt_o = slope(stepo, jnp.float32(0.0))

            h2 = st.closest_hit_stream_xla(oc, dc, acc2)
            o2 = st.any_hit_stream_xla(pc, lc, acc2, 1e-3, tmax_s)
            if t_ref is None:
                t_ref, occ_ref = np.asarray(h2.t), np.asarray(o2)
            match = (np.array_equal(np.asarray(h2.t), t_ref)
                     and np.array_equal(np.asarray(o2), occ_ref))
            say(f"  slab={'on ' if slab_on else 'off'} {sname}: "
                f"closest {dt_c*1e9/n:6.2f} ns/ray  "
                f"anyhit {dt_o*1e9/n:6.2f} ns/ray  match={match}")
    st._PAIR_SCHEDULE = old_sched


if __name__ == "__main__":
    main()
