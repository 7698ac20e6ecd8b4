"""Round-4 part K: decompose the flat-path OCCLUSION trace at 1080p.

Pass-3 visibility runs ~33.8 ns/lane even as pixel-coherent N-sized
queries (r4e), while coherent primary closest runs 12.9 (r4h) — yet
occlusion rounds have NO epilogue and shadow worklists are only ~25%
fatter (r4i CPU stats).  Something occlusion-specific costs ~2x.  This
script takes ONE real pass-3-style visibility batch (x1 -> reservoir
light point, live mask) and times: ship flat anyhit, brute anyhit,
cull-only, cull+sort, sweep-only, sweep with fetch stubbed, occlusion
pair-doubling on/off, and closest-hit on the SAME segments for
reference.

Run alone (single tunneled chip).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401
from royaltracer_dx_tpu.cli import build_scene
from royaltracer_dx_tpu.config import RenderConfig
from royaltracer_dx_tpu.ops import restir
from royaltracer_dx_tpu.ops import stream_trace as stx
from royaltracer_dx_tpu.render import restir_renderer as rr
from royaltracer_dx_tpu.utils import pvec as pv


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


def main():
    say("device:", jax.devices()[0])
    scene, camera = build_scene("reference")
    W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1920, 1080)
    cfg = RenderConfig(width=W, height=H)
    r = rr.RestirRenderer(scene, camera, cfg)
    sa = r.scene_arrays
    n = cfg.num_pixels
    say(f"{W}x{H} N={n}")

    cam = r._camera_arrays()
    frame = jnp.uint32(7)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)
    jax.block_until_ready(res_di["w_sum"])

    # the real pass-3-style segment batch: x1 + biased origin -> x2
    x1, n1 = sdata["x1"], sdata["n1"]
    x2 = res_di["x2"]
    live = gi_in["sampling"]
    o = pv.add(x1, pv.scale(pv.normalize(n1), restir.S_BIAS))
    d = pv.sub(x2, x1)
    dist = pv.length(d)
    dirs = pv.normalize(d)
    t_max = jnp.where(live, jnp.maximum(dist - 10.0 * restir.S_BIAS,
                                        2.0 * restir.S_BIAS), -1.0)
    t_min = jnp.zeros_like(t_max)
    accel = sa.stream
    say(f"clusters={accel.num_blocks * stx.S}")

    # worklist stats for THIS batch
    oc, dc = o, dirs
    n_pad = -(-n // stx.TILE) * stx.TILE
    pads = n_pad - n
    ocp = tuple(jnp.pad(c, (0, pads)) for c in oc)
    dcp = tuple(jnp.pad(c, (0, pads), constant_values=1.0) for c in dc)
    tminp = jnp.pad(t_min, (0, pads))
    tmaxp = jnp.pad(t_max, (0, pads), constant_values=-1.0)
    tiles = n_pad // stx.TILE
    b = accel.num_blocks
    c_all = b * stx.S
    ot = [c.reshape(tiles, stx.TILE)[..., None] for c in ocp]
    dt_ = [c.reshape(tiles, stx.TILE)[..., None] for c in dcp]
    tmin_t = tminp.reshape(tiles, stx.TILE)[..., None]
    tmax_t = tmaxp.reshape(tiles, stx.TILE)[..., None]
    rays = (ot, dt_, tmin_t, tmax_t)
    boxes = jnp.broadcast_to(accel.blk_boxes[None, :, :, :stx.S],
                             (tiles, b, 6, stx.S))

    @jax.jit
    def wl():
        rpass, rentry = stx._per_ray_box_cull(rays, boxes)
        return jnp.sum(rpass.astype(jnp.int32), axis=1)
    cc = np.asarray(wl())
    say(f"vis tile-union worklists: mean {cc.mean():.1f} p50 "
        f"{np.percentile(cc, 50):.0f} p99 {np.percentile(cc, 99):.0f} "
        f"max {cc.max()} (of {c_all})")

    # ---- ship paths
    def any_flat(x):
        occ = stx.any_hit_stream_xla(
            tuple(c + x * 1e-20 for c in o), dirs, accel, t_min, t_max)
        return x + jnp.sum(occ[:8].astype(jnp.float32)) * 1e-12
    say(f"  anyhit flat (ship)       : {slope(any_flat)*1e3:8.1f} ms")

    from royaltracer_dx_tpu.ops import intersect
    def any_brute(x):
        occ = intersect.any_hit_brute(
            tuple(c + x * 1e-20 for c in o), dirs, sa.tri_verts,
            t_min, t_max)
        return x + jnp.sum(occ[:8].astype(jnp.float32)) * 1e-12
    try:
        say(f"  anyhit brute             : {slope(any_brute)*1e3:8.1f} ms")
    except Exception as e:  # noqa: BLE001
        say(f"  anyhit brute             : FAILED {type(e).__name__} {e}")

    def closest_same(x):
        hit = stx.closest_hit_stream_xla(
            tuple(c + x * 1e-20 for c in o), dirs, accel, 1e-4,
            jnp.maximum(t_max, 1e-4))
        return x + jnp.sum(hit.t[:8]) * 1e-12
    say(f"  closest flat same segs   : {slope(closest_same)*1e3:8.1f} ms")

    # ---- decomposition: cull only, cull+sort, full
    def cull_only(x):
        rays2 = ([c + x * 1e-20 for c in ot], dt_, tmin_t, tmax_t)
        rpass, rentry = stx._per_ray_box_cull(rays2, boxes)
        return x + jnp.sum(rentry[0, :4]) * 1e-12
    say(f"  cull only                : {slope(cull_only)*1e3:8.1f} ms")

    def cull_sort(x):
        rays2 = ([c + x * 1e-20 for c in ot], dt_, tmin_t, tmax_t)
        rpass, rentry = stx._per_ray_box_cull(rays2, boxes)
        cid = jnp.broadcast_to(
            jnp.arange(c_all, dtype=jnp.int32)[None, :], (tiles, c_all))
        ckey = jnp.where(rpass, rentry, stx.INF)
        centry, ccid = stx._packed_sort(ckey, cid, c_all)
        return x + jnp.sum(centry[0, :4]) * 1e-12 + ccid[0, 0] * 1e-12
    say(f"  cull + packed sort       : {slope(cull_sort)*1e3:8.1f} ms")

    # ---- sweep A/Bs via module knobs
    for label, fetch, dbl in (
            ("anyhit fetch=fake", "fake", True),
            ("anyhit no pair-doubling", None, False),
    ):
        stx._FETCH_MODE = fetch
        stx._OCC_PAIR_DOUBLE = dbl
        jax.clear_caches()
        dt = slope(any_flat)
        say(f"  {label:24s} : {dt*1e3:8.1f} ms")
        stx._FETCH_MODE = None
        stx._OCC_PAIR_DOUBLE = True
        jax.clear_caches()


if __name__ == "__main__":
    main()
