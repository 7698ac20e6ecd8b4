"""Round-5 part A: the frame-composition tax at 1080p.

Theory (from r5 bench run 1's calibration + r4w): the 2.4 s of non-trace
1080p frame (pass1_gi 1008 ms + pass3 non-vis ~730 ms + pass1_di
non-trace ~330 ms) and the 8x in-frame pass2 anomaly (188 ms in-frame vs
23.4 ms standalone) are COMPOSITION costs — materialized pass-boundary
buffers, relayouts, per-dispatch sync — not math.  The decisive
experiment is the fused whole frame: `_render_many(k=1)` runs the exact
same frame as ONE XLA program.  If fused-frame time << sum of in-frame
pass ticks, the boundary-tax theory is confirmed and render_many IS the
fix; if fused ~= dispatch-composed, the cost is inside the passes.

Measurement order (cheapest first; every row prints immediately so a
wedged tunnel still leaves data):
  1. elementwise 8-op chain at 2M/16M f32 -> device-state pin (GB/s).
  2. dispatch-composed render() warm frame (the r4q3 2.73 s row).
  3. fused _render_many(k=1) and k=2 slope -> per-frame fused cost.
  4. pass2_temporal + _pack_last slope-timed with REAL chained inputs
     (the r4 anomaly re-measure, pack ticked separately).
  5. cost_analysis bytes-accessed for the pass jits -> implied GB/s
     against the calibrated rate (traffic model).

Run alone (single tunneled chip).  Sizes via argv: W H (default 1920
1080).
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


def bestwall(fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    t_start = time.perf_counter()
    say("device:", jax.devices()[0])

    # ---------- 1. device-state pin
    for n_elts, tag in ((2 * 1024 * 1024, "2M"), (16 * 1024 * 1024, "16M")):
        x0 = jnp.ones((n_elts,), jnp.float32)

        @jax.jit
        def chain(x, k=8):
            y = x
            for _ in range(k):
                y = y * 1.0000001 + 1e-9
            return y

        y = chain(x0)
        y.block_until_ready()
        dt = bestwall(lambda: chain(x0).block_until_ready(), 5)
        say(f"  ew {tag} 8-op chain: {dt*1e3:7.3f} ms  "
            f"{2*n_elts*4/dt/1e9:7.1f} GB/s r+w   [t={time.perf_counter()-t_start:.0f}s]")

    W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1920, 1080)
    scene, camera = build_scene("reference")
    cfg = RenderConfig(width=W, height=H)
    r = rr.RestirRenderer(scene, camera, cfg)
    say(f"{W}x{H} N={cfg.num_pixels}")

    # ---------- 2. dispatch-composed warm frame
    t0 = time.perf_counter()
    r.render()
    say(f"  render() cold (compile)     : {time.perf_counter()-t0:8.1f} s")
    dt = bestwall(lambda: r.render(), 3)
    say(f"  render() warm frame         : {dt*1e3:8.1f} ms   "
        f"[t={time.perf_counter()-t_start:.0f}s]")

    # per-pass in-frame ticks (one profiled frame)
    r.profile = True
    r.render()
    r.profile = False
    say("  in-frame pass ticks ms      :",
        {k: round(v * 1e3, 1)
         for k, v in r.metrics.get("pass_times_s", {}).items()})

    # ---------- 3. fused whole frame
    t0 = time.perf_counter()
    r.render_many(1)
    say(f"  render_many(1) cold compile : {time.perf_counter()-t0:8.1f} s")
    dt1 = bestwall(lambda: r.render_many(1), 3)
    say(f"  render_many(1) warm         : {dt1*1e3:8.1f} ms")
    t0 = time.perf_counter()
    r.render_many(2)
    c2 = time.perf_counter() - t0
    dt2 = bestwall(lambda: r.render_many(2), 2)
    say(f"  render_many(2) warm         : {dt2*1e3:8.1f} ms "
        f"({dt2/2*1e3:.1f} ms/frame; cold {c2:.1f}s)  "
        f"[t={time.perf_counter()-t_start:.0f}s]")

    # ---------- 4. pass2 + pack with REAL chained inputs (r4 8x anomaly)
    cam = r._camera_arrays()
    frame = jnp.uint32(7)
    res_di, sdata, gi_in, seed = rr.pass1_di(r.scene_arrays, cam, frame, cfg)
    gst = rr.pass1_gi_init(r.scene_arrays, gi_in, seed, cfg)
    for b in range(cfg.gi_bounces):
        gst = rr.pass1_gi_bounce(r.scene_arrays, cfg, gst, jnp.uint32(b))
    res_gi, _ = rr.pass1_gi_final(r.scene_arrays, gi_in, gst, cfg)
    jax.block_until_ready(res_gi["w_sum"])
    say("  pass1 chain ready")

    def pack():
        out = rr._pack_last(r.last_di, r.last_gi, r.last_sdata,
                            rr._rec_dtype(cfg))
        jax.block_until_ready(out)
        return out

    pd, pg = pack()
    dt = bestwall(pack, 3)
    say(f"  _pack_last warm             : {dt*1e3:8.1f} ms")

    def p2():
        out = rr.pass2_temporal(r.scene_arrays, cam, frame, res_di, res_gi,
                                sdata, pd, pg, cfg)
        jax.block_until_ready(out)
        return out

    p2()
    dt = bestwall(p2, 3)
    say(f"  pass2_temporal chained warm : {dt*1e3:8.1f} ms   "
        f"[t={time.perf_counter()-t_start:.0f}s]")

    # ---------- 5. traffic model: cost_analysis on the warm pass jits
    def costrow(name, jitted, *args):
        try:
            c = jitted.lower(*args).compile()
            ca = c.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            by = ca.get("bytes accessed", 0.0) / 1e9
            fl = ca.get("flops", 0.0) / 1e9
            say(f"  cost {name:12s}: {by:8.2f} GB accessed {fl:9.1f} Gflop"
                f" -> {by/120.0*1e3:7.1f} ms @120GB/s")
        except Exception as e:
            say(f"  cost {name}: ERROR {e!r:.120}")

    costrow("pass1_di", rr.pass1_di, r.scene_arrays, cam, frame, cfg)
    costrow("gi_bounce", rr.pass1_gi_bounce, r.scene_arrays, cfg, gst,
            jnp.uint32(1))
    costrow("pass2", rr.pass2_temporal, r.scene_arrays, cam, frame,
            res_di, res_gi, sdata, pd, pg, cfg)
    costrow("pass3", rr.pass3_spatial, r.scene_arrays, cam, frame,
            res_di, res_gi, sdata, cfg)
    say(f"done [t={time.perf_counter()-t_start:.0f}s]")


if __name__ == "__main__":
    main()
