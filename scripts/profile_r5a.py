"""Round-5 part A: is the non-trace 1080p glue MEMORY-TRAFFIC bound?

The r5 bench calibration measured sustained elementwise r+w at ~120 GB/s
on the tunneled v5e (nominal HBM ~819).  At N=2.07M lanes a materialized
f32 plane is 8.3 MB, so every un-fused producer->consumer hop costs
~0.14 ms.  If XLA materializes a few thousand plane-sized buffers per
pass, that alone explains the 2.4 s of non-trace frame (pass1_gi 1008 ms
+ pass3 non-vis ~730 ms + pass1_di non-trace ~330 ms) — and the r4o
tries-cliff (6->423, 7->382, 8->861, 9->733 ms) would be fusion-boundary
placement, not math.

This script tests the theory directly:
  1. `compiled.cost_analysis()` bytes-accessed per pass vs measured ms
     -> implied GB/s.  If implied ~= calibrated 120 GB/s, the glue is
     bandwidth-bound and the lever is TRAFFIC (fewer materialized
     planes), not flops.
  2. pass2 chained vs _pack_last (the r4 8x anomaly, re-measured with
     the pack ticked separately).
  3. elementwise-rate ladder: copy / 1-op / 8-op / 64-op fused chains at
     2M and 16M f32 to separate per-launch overhead from streaming rate.

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
from royaltracer_dx_tpu.render import restir_renderer as rr


def say(*a):
    print(*a, flush=True)


def slope(fn, args=(), reps=(1, 3)):
    times = {}
    for k in reps:
        @jax.jit
        def loop(x, a):
            return jax.lax.fori_loop(0, k, lambda i, x: fn(x, *a), x)
        r = loop(jnp.float32(0.0), args)
        np.asarray(r)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(jnp.float32(0.0), args)
            np.asarray(r)
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = reps
    return (times[k2] - times[k1]) / (k2 - k1)


def cost(fn, *args, static=()):
    """Compile fn and return (bytes accessed GB, flops G, optimal ms at
    the calibrated 120 GB/s)."""
    c = jax.jit(fn, static_argnames=static).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    by = ca.get("bytes accessed", 0.0)
    fl = ca.get("flops", 0.0)
    return by / 1e9, fl / 1e9


def main():
    say("device:", jax.devices()[0])

    # ---------- 3. elementwise-rate ladder (per-launch overhead split)
    for n_elts, tag in ((2 * 1024 * 1024, "2M"), (16 * 1024 * 1024, "16M")):
        x0 = jnp.ones((n_elts,), jnp.float32)
        for ops, label in ((0, "copy"), (1, "1 op"), (8, "8 ops"),
                           (64, "64 ops")):
            def step(x, buf):
                y = buf + x * 1e-20
                for i in range(ops):
                    y = y * 1.0000001 + 1e-9
                return x + y[0] * 1e-12
            dt = slope(step, (x0,))
            gbs = 2 * n_elts * 4 / dt / 1e9
            say(f"  ew {tag} {label:6s}: {dt*1e3:7.3f} ms  "
                f"{gbs:7.1f} GB/s (r+w)")

    scene, camera = build_scene("reference")
    W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1920, 1080)
    cfg = RenderConfig(width=W, height=H)
    r = rr.RestirRenderer(scene, camera, cfg)
    sa = r.scene_arrays
    say(f"{W}x{H} N={cfg.num_pixels}")

    cam = r._camera_arrays()
    frame = jnp.uint32(7)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)
    st0 = rr.pass1_gi_init(sa, gi_in, seed, cfg)
    st = st0
    for b in range(cfg.gi_bounces):
        st = rr.pass1_gi_bounce(sa, cfg, st, jnp.uint32(b))
    res_gi, _ = rr.pass1_gi_final(sa, gi_in, st, cfg)
    jax.block_until_ready(res_gi["w_sum"])
    say("pass1 inputs ready")

    # ---------- 1. cost_analysis vs measured, per pass
    rows = [
        ("pass1_di", lambda: rr.pass1_di.__wrapped__(sa, cam, frame, cfg),
         None),
        ("gi_bounce", lambda: rr.pass1_gi_bounce.__wrapped__(
            sa, cfg, st0, jnp.uint32(1)), None),
        ("pass3", lambda: rr.pass3_spatial.__wrapped__(
            sa, cam, frame, dict(res_di), dict(res_gi), dict(sdata), cfg),
         None),
    ]
    for name, thunk, _ in rows:
        try:
            by, fl = cost(lambda: thunk())
            say(f"  cost {name:10s}: {by:8.2f} GB accessed, {fl:9.1f} Gflop"
                f" -> {by/120.0*1e3:7.1f} ms at 120 GB/s,"
                f" {fl/4900*1e3:7.1f} ms at 4.9 Tf/s")
        except Exception as e:
            say(f"  cost {name}: ERROR {e!r:.120}")

    # measured (visibility left REAL here; compare against r4 ticks)
    def m_bounce(x, stin):
        s2 = dict(stin)
        s2["origin"] = tuple(c + x * 1e-20 for c in s2["origin"])
        out = rr.pass1_gi_bounce.__wrapped__(sa, cfg, s2, jnp.uint32(1))
        return x + out["acc_l"][0][0] * 1e-9
    dt = slope(m_bounce, (st0,))
    say(f"  measured gi_bounce           : {dt*1e3:8.1f} ms")

    def m_p1(x):
        cam2 = dict(cam)
        cam2["view_inv"] = cam["view_inv"] + x * 1e-20
        rdi, sd, gii, s = rr.pass1_di.__wrapped__(sa, cam2, frame, cfg)
        return x + rdi["w"][0] * 1e-9 + sd["x1"][0][0] * 1e-9
    dt = slope(m_p1)
    say(f"  measured pass1_di            : {dt*1e3:8.1f} ms")

    def m_p3(x):
        sd = dict(sdata)
        sd["x1"] = tuple(c + x * 1e-20 for c in sd["x1"])
        rad, shading, odi, ogi = rr.pass3_spatial.__wrapped__(
            sa, cam, frame, dict(res_di), dict(res_gi), sd, cfg)
        return x + rad[0, 0] * 1e-9 + odi["w"][0] * 1e-9
    dt = slope(m_p3)
    say(f"  measured pass3 (real vis)    : {dt*1e3:8.1f} ms")

    # ---------- 2. pass2 + pack (the r4 8x anomaly)
    r.render()
    r.render()
    jax.block_until_ready(r.fb.accum)

    import dataclasses as dc

    def run_pack(x):
        ld = dc.replace(r.last_di, w_sum=r.last_di.w_sum + x * 1e-20)
        pd, pg = rr._pack_last(ld, r.last_gi, r.last_sdata,
                               rr._rec_dtype(cfg))
        return x + pd[0][0, 0].astype(jnp.float32) * 1e-9 \
            + pg[0][0, 0].astype(jnp.float32) * 1e-9
    dt = slope(run_pack)
    say(f"  _pack_last (3+3 tables)      : {dt*1e3:8.1f} ms")

    pd, pg = rr._pack_last(r.last_di, r.last_gi, r.last_sdata,
                           rr._rec_dtype(cfg))
    from royaltracer_dx_tpu.ops.reservoir import sdata_to_planes

    def run_pass2(x):
        sd = sdata_to_planes(r.last_sdata)
        sd["x1"] = tuple(c + x * 1e-20 for c in sd["x1"])
        rdi, rgi = rr.pass2_temporal.__wrapped__(
            sa, cam, frame, dict(res_di), dict(res_gi), sd, pd, pg, cfg)
        return x + rdi["w_sum"][0] * 1e-9 + rgi["w_sum"][0] * 1e-9
    dt = slope(run_pass2)
    say(f"  pass2_temporal chained       : {dt*1e3:8.1f} ms")

    try:
        by, fl = cost(lambda: rr.pass2_temporal.__wrapped__(
            sa, cam, frame, dict(res_di), dict(res_gi),
            sdata_to_planes(r.last_sdata), pd, pg, cfg))
        say(f"  cost pass2     : {by:8.2f} GB accessed, {fl:9.1f} Gflop"
            f" -> {by/120.0*1e3:7.1f} ms at 120 GB/s")
    except Exception as e:
        say(f"  cost pass2: ERROR {e!r:.120}")


if __name__ == "__main__":
    main()
