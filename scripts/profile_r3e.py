"""Round-3 part E: packed 1-op candidate sort, window sub-stage costs,
wb sweep, reversed-segment any-hit.  Run alone (single tunneled chip)."""

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
    say(f"build cold-process {time.perf_counter()-t0:.1f}s "
        f"blocks {accel.num_blocks}")

    # ---- full closest at wb in {16, 32, 64} (packed sort, no prime)
    for wb in (16, 32, 64):
        def full_step(o, wb=wb):
            h = st.closest_hit_stream_xla(o, dirs, accel, wb=wb)
            return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
        dt = slope(full_step, origins)
        say(f"closest wb={wb}: {dt*1e3:7.2f} ms {n/dt/1e6:5.2f} Mrays/s")

    # ---- window sub-stages at wb=32
    tmin = jnp.broadcast_to(jnp.float32(1e-4), (n,))
    tmax = jnp.broadcast_to(jnp.float32(1e4), (n,))
    tiles = n // st.TILE

    def tileize(o):
        oo = [o[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
        dd = [dirs[:, c].reshape(tiles, st.TILE)[..., None] for c in range(3)]
        return (oo, dd, tmin.reshape(tiles, st.TILE)[..., None],
                tmax.reshape(tiles, st.TILE)[..., None])

    def win_nocull_nosort(o):
        sbid, skey, bcnt, tb = st._block_sort(o, dirs, tmin, tmax, accel)
        o_lo, o_hi, d_lo, d_hi, t_lo, t_hi = tb
        wl = sbid[:, :32]
        flat_bid = wl.reshape(tiles * 32)
        oh = (flat_bid[:, None] == jnp.arange(
            accel.num_blocks, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
        rows = jnp.dot(oh, accel.blk_boxes_bf16,
                       preferred_element_type=jnp.float32)
        boxes = rows.reshape(tiles, 32, 6, st.S)
        cl_lo = jnp.moveaxis(boxes[:, :, 0:3, :], 2, 3)
        cl_hi = jnp.moveaxis(boxes[:, :, 3:6, :], 2, 3)
        cok, centry = st._interval_slab_batched(
            o_lo, o_hi, d_lo, d_hi, cl_lo, cl_hi, t_lo, t_hi)
        return o + centry[:1, :1, :1].reshape(1, 1) * 1e-12

    def win_cull_nosort(o):
        sbid, skey, bcnt, tb = st._block_sort(o, dirs, tmin, tmax, accel)
        o_lo, o_hi, d_lo, d_hi, t_lo, t_hi = tb
        rays = tileize(o)
        wl = sbid[:, :32]
        flat_bid = wl.reshape(tiles * 32)
        oh = (flat_bid[:, None] == jnp.arange(
            accel.num_blocks, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
        rows = jnp.dot(oh, accel.blk_boxes_bf16,
                       preferred_element_type=jnp.float32)
        boxes = rows.reshape(tiles, 32, 6, st.S)
        cl_lo = jnp.moveaxis(boxes[:, :, 0:3, :], 2, 3)
        cl_hi = jnp.moveaxis(boxes[:, :, 3:6, :], 2, 3)
        cok, centry = st._interval_slab_batched(
            o_lo, o_hi, d_lo, d_hi, cl_lo, cl_hi, t_lo, t_hi)
        rpass, rentry = st._per_ray_box_cull(rays, boxes)
        centry = jnp.maximum(centry.reshape(tiles, -1), rentry)
        return o + centry[:1, :1].reshape(1, 1) * 1e-12

    def win_full_packed(o):
        sbid, skey, bcnt, tb = st._block_sort(o, dirs, tmin, tmax, accel)
        rays = tileize(o)
        ccid, centry, ccnt = st._cluster_window(
            sbid, skey, tb, accel, 32, 0, rays)
        return o + centry[:1, :1].reshape(1, 1) * 1e-12

    def win_full_2op(o):
        sbid, skey, bcnt, tb = st._block_sort(o, dirs, tmin, tmax, accel)
        rays = tileize(o)
        sort_saved = st._packed_sort
        st._packed_sort = lambda k, i, nn: jax.lax.sort(
            (k, i), dimension=1, num_keys=1)
        try:
            ccid, centry, ccnt = st._cluster_window(
                sbid, skey, tb, accel, 32, 0, rays)
        finally:
            st._packed_sort = sort_saved
        return o + centry[:1, :1].reshape(1, 1) * 1e-12

    for name, f in [("w1 fetch+slab      ", win_nocull_nosort),
                    ("w2 +per-ray cull   ", win_cull_nosort),
                    ("w3 +packed sort    ", win_full_packed),
                    ("w4 (2-op sort ref) ", win_full_2op)]:
        dt = slope(f, origins)
        say(f"{name} {dt*1e3:7.2f} ms")

    # ---- anyhit: realistic occlusion, forward vs reversed
    hit = st.closest_hit_stream_xla(origins, dirs, accel, wb=32)
    t = jnp.where(hit.t < 1e29, hit.t, 2.0)
    hp = origins + dirs * (t[:, None] * 0.999)
    light = jnp.asarray([0.0, 0.9, 0.0], jnp.float32)
    toL = light[None, :] - hp
    dist = jnp.linalg.norm(toL, axis=1, keepdims=True)
    sd = toL / dist
    tmax_s = dist[:, 0] - 1e-3
    tmin_s = jnp.broadcast_to(jnp.float32(1e-3), tmax_s.shape)

    for rev in (False, True):
        def any_step(o, rev=rev):
            occ = st.any_hit_stream_xla(o, sd, accel, tmin_s, tmax_s,
                                        wb=32, presort=True, reverse=rev)
            return o + occ[:, None].astype(jnp.float32) * 1e-9
        dt = slope(any_step, hp)
        occ = st.any_hit_stream_xla(hp, sd, accel, tmin_s, tmax_s,
                                    wb=32, presort=True, reverse=rev)
        of = float(jnp.mean(occ.astype(jnp.float32)))
        say(f"anyhit rev={int(rev)}: {dt*1e3:7.2f} ms "
            f"{n/dt/1e6:5.2f} Mrays/s occfrac {of:.3f}")

    # reversed == forward parity
    occ_f = st.any_hit_stream_xla(hp, sd, accel, tmin_s, tmax_s, wb=32)
    occ_r = st.any_hit_stream_xla(hp, sd, accel, tmin_s, tmax_s, wb=32,
                                  reverse=True)
    nd = int(jnp.sum(occ_f != occ_r))
    say(f"anyhit reverse parity: {nd}/{n} differ")

    # ---- closest parity vs brute (packed sort exactness on TPU)
    from royaltracer_dx_tpu.ops.intersect import closest_hit_brute
    sub = slice(0, 32768)
    hs = st.closest_hit_stream_xla(origins[sub], dirs[sub], accel, wb=32)
    hb = closest_hit_brute(origins[sub], dirs[sub], tris)
    ok_t = bool(jnp.all(jnp.abs(hs.t - hb.t) <= 0).item())
    ok_i = bool(jnp.all((hs.t > 1e29) | (hs.tri == hb.tri)).item())
    say("parity t:", ok_t, "tri:", ok_i)


if __name__ == "__main__":
    main()
