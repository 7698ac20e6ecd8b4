"""Round-4 part H: time the REAL pass-1 GI trace batches standalone.

r4e attributed 942 ms of the 1080p frame to pass1_gi's five trace sites
(~91 ns/lane), yet r3t measured the real continuation batch at 26.8
ns/ray on the flat path.  This script extracts the EXACT ray batches the
bounces trace at 1920x1080 and times each one standalone under the
dispatch modes (current, brute, flat+presort), plus worklist-size stats,
to find where the in-situ cost comes from and which dispatch is right.

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
from royaltracer_dx_tpu.ops import restir, restir_gi
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


def wl_stats(sa, o, d, t_min, t_max):
    """Per-tile flat-path worklist sizes (replicates _trace_flat's cull)."""
    from royaltracer_dx_tpu.ops import stream_trace as stx

    oc, dc = tuple(o), tuple(d)
    n = oc[0].shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    n_pad = -(-n // stx.TILE) * stx.TILE
    pad = n_pad - n
    if pad:
        oc = tuple(jnp.pad(c, (0, pad)) for c in oc)
        dc = tuple(jnp.pad(c, (0, pad), constant_values=1.0) for c in dc)
        t_min = jnp.pad(t_min, (0, pad))
        t_max = jnp.pad(t_max, (0, pad), constant_values=-1.0)
    tiles = n_pad // stx.TILE
    b = sa.stream.num_blocks
    o_t = [c.reshape(tiles, stx.TILE)[..., None] for c in oc]
    d_t = [c.reshape(tiles, stx.TILE)[..., None] for c in dc]
    tmin_t = t_min.reshape(tiles, stx.TILE)[..., None]
    tmax_t = t_max.reshape(tiles, stx.TILE)[..., None]
    rays = (o_t, d_t, tmin_t, tmax_t)
    boxes = jnp.broadcast_to(sa.stream.blk_boxes[None, :, :, :stx.S],
                             (tiles, b, 6, stx.S))
    rpass, _ = stx._per_ray_box_cull(rays, boxes)
    ccnt = np.asarray(jnp.sum(rpass.astype(jnp.int32), axis=1))
    return (float(ccnt.mean()), float(np.percentile(ccnt, 50)),
            float(np.percentile(ccnt, 99)), int(ccnt.max()),
            b * stx.S)


def time_batch(tag, sa, cfg, o, d, t_min=1e-4):
    n = o[0].shape[0]
    mean, p50, p99, mx, c_all = wl_stats(sa, o, d, t_min, 1e30)
    say(f"  [{tag}] N={n}  tile-union clusters: mean {mean:.1f} "
        f"p50 {p50:.0f} p99 {p99:.0f} max {mx} (of {c_all})")

    from royaltracer_dx_tpu.ops.intersect import closest_hit_brute
    from royaltracer_dx_tpu.ops.stream_trace import closest_hit_stream_xla

    def t_flat(x):
        hit = closest_hit_stream_xla(
            tuple(c + x * 1e-20 for c in o), d, sa.stream,
            t_min=jnp.full((n,), t_min), t_max=jnp.full((n,), 1e30),
            wb=cfg.stream_wb, presort=False)
        return x + jnp.sum(hit.t[:8]) * 1e-12

    def t_flat_sorted(x):
        hit = closest_hit_stream_xla(
            tuple(c + x * 1e-20 for c in o), d, sa.stream,
            t_min=jnp.full((n,), t_min), t_max=jnp.full((n,), 1e30),
            wb=cfg.stream_wb, presort=True)
        return x + jnp.sum(hit.t[:8]) * 1e-12

    def t_brute(x):
        hit = closest_hit_brute(
            tuple(c + x * 1e-20 for c in o), d, sa.tri_verts,
            t_min=jnp.full((n,), t_min), t_max=jnp.full((n,), 1e30))
        return x + jnp.sum(hit.t[:8]) * 1e-12

    for name, fn in (("flat", t_flat), ("flat+presort", t_flat_sorted),
                     ("brute", t_brute)):
        dt = slope(fn)
        say(f"  [{tag}] {name:14s}: {dt*1e3:8.1f} ms  ({dt/n*1e9:5.1f} ns/ray)")


def main():
    say("device:", jax.devices()[0])
    scene, camera = build_scene("reference")
    W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1920, 1080)
    cfg = RenderConfig(width=W, height=H)
    r = rr.RestirRenderer(scene, camera, cfg)
    sa = r.scene_arrays
    say(f"{W}x{H} N={cfg.num_pixels}")
    r.render()
    jax.block_until_ready(r.fb.accum)

    cam = r._camera_arrays()
    frame = jnp.uint32(r.frame)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)

    # capture the exact (origin, dir) batches each GI site traces by
    # monkeypatching the trace call (running unjitted)
    real_tc = restir.trace_closest_p
    captured = []

    def capture_tc(scene_, origins, dirs, cfg_, t_min=1e-4, coherent=True):
        captured.append((tuple(origins), tuple(dirs), t_min, coherent))
        return real_tc(scene_, origins, dirs, cfg_, t_min=t_min,
                       coherent=coherent)

    restir.trace_closest_p = capture_tc
    restir_gi.restir.trace_closest_p = capture_tc
    st = rr.pass1_gi_init.__wrapped__(sa, gi_in, seed, cfg)
    for b in range(cfg.gi_bounces):
        st = rr.pass1_gi_bounce.__wrapped__(sa, cfg, st, jnp.uint32(b))
    restir.trace_closest_p = real_tc
    restir_gi.restir.trace_closest_p = real_tc

    say(f"captured {len(captured)} closest sites")
    for i, (o, d, t_min, coh) in enumerate(captured):
        o = tuple(jnp.asarray(c) for c in o)
        d = tuple(jnp.asarray(c) for c in d)
        jax.block_until_ready(o[0])
        tag = "gi_init" if i == 0 else f"bounce{i-1}"
        time_batch(f"{tag} coh={coh}", sa, cfg, o, d, t_min)

    # primary rays for reference (coherent batch)
    from royaltracer_dx_tpu.camera import generate_rays
    xs, ys = rr._pixel_grid(cfg)
    origins, dirs = generate_rays(cam, cfg.width, cfg.height, None,
                                  xs=xs, ys=ys)
    from royaltracer_dx_tpu.utils import math3d as m3
    dirs = m3.normalize(dirs)
    o = tuple(origins[:, c] for c in range(3))
    d = tuple(dirs[:, c] for c in range(3))
    time_batch("primary coh=True", sa, cfg, o, d)


if __name__ == "__main__":
    main()
