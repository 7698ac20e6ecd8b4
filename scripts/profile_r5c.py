"""Round-5 part C: the scattered-trace pool at 1080p.

r4w decomposition (TPU, garage 1080p): the frame is TRACE-bound —
pass1_di novis = 351 ms of which trace 333; a GI bounce = 228 ms of
which trace 219 (= ~106 ns/ray, vs r3m's 26.8 standalone); pass3 novis
706 of which the two claim loops ~500.  Total trace/visibility ~1.8 s of
the 2.74 s frame.  This script measures the new dead-lane retirement
(cfg.retire_dead_lanes) and re-arbitrates flat-vs-brute on the REAL
in-frame continuation batches in today's device state:

  1. warm frame A/B: retire_dead_lanes True vs False (full 1080p).
  2. capture the EXACT (origin, dir, live) of every closest trace in
     pass1_di + the GI chain (trace-spy under one jit).
  3. per-batch standalone slope: flat as-is / flat+live / brute, plus
     occupancy of each batch.

Run alone (single tunneled chip).  argv: W H (default 1920 1080).
"""

import dataclasses
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


def say(*a):
    print(*a, flush=True)


def slope(fn, args=(), reps=(1, 3)):
    """Per-iteration time of fn via fori_loop at two trip counts.
    fn(x, *args) -> x'.  Big inputs MUST ride in args (a closure bakes
    them into the uploaded HLO -> tunnel HTTP 413)."""
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


def main():
    t_start = time.perf_counter()
    say("device:", jax.devices()[0])
    scene, camera = build_scene("reference")
    W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1920, 1080)
    cfg = RenderConfig(width=W, height=H)
    cfg_off = dataclasses.replace(cfg, retire_dead_lanes=False)

    # ---------- 1. full-frame A/B
    r_on = rr.RestirRenderer(scene, camera, cfg)
    r_on.render()
    t0 = time.perf_counter()
    for _ in range(3):
        r_on.render()
    dt_on = (time.perf_counter() - t0) / 3
    say(f"  frame retire=True            : {dt_on*1e3:8.1f} ms  "
        f"[t={time.perf_counter()-t_start:.0f}s]")
    r_on.profile = True
    r_on.render()
    r_on.profile = False
    say("  ticks:", {k: round(v * 1e3, 1)
                     for k, v in r_on.metrics["pass_times_s"].items()})

    r_off = rr.RestirRenderer(scene, camera, cfg_off)
    r_off.render()
    t0 = time.perf_counter()
    for _ in range(3):
        r_off.render()
    dt_off = (time.perf_counter() - t0) / 3
    say(f"  frame retire=False           : {dt_off*1e3:8.1f} ms  "
        f"[t={time.perf_counter()-t_start:.0f}s]")
    del r_off

    # equality spot check (1 frame from fresh state, same seeds)
    a = rr.RestirRenderer(scene, camera, cfg)
    b = rr.RestirRenderer(scene, camera, cfg_off)
    a.render(), b.render()
    d = np.abs(a.radiance() - b.radiance()).max()
    say(f"  1-frame A/B max |diff|       : {d:.2e}")
    del a, b

    # ---------- 2. capture the real trace batches
    sa = r_on.scene_arrays
    cam = r_on._camera_arrays()
    frame = jnp.uint32(7)

    coh_flags = []

    @jax.jit
    def capture():
        rec = []
        orig = restir.trace_closest_p

        def spy(scene_, o, d, cfg_, t_min=1e-4, coherent=True, live=None):
            rec.append((restir.as_planes3(o), restir.as_planes3(d), live))
            coh_flags.append(bool(coherent))
            return orig(scene_, o, d, cfg_, t_min=t_min, coherent=coherent,
                        live=live)

        restir.trace_closest_p = spy
        try:
            res_di, sdata, gi_in, seed = rr.pass1_di.__wrapped__(
                sa, cam, frame, cfg)
            st = restir_gi.gi_init(sa, cfg, gi_in["x1"], gi_in["n1"],
                                   gi_in["o"], gi_in["mid"], seed,
                                   live=gi_in["sampling"])
            st["active"] = st["active"] & gi_in["sampling"]
            for bi in range(cfg.gi_bounces):
                st = restir_gi.gi_bounce(sa, cfg, st, jnp.uint32(bi))
        finally:
            restir.trace_closest_p = orig
        return rec

    batches = capture()
    say(f"  captured {len(batches)} closest-trace batches "
        f"[t={time.perf_counter()-t_start:.0f}s]")
    labels = (["p1_primary", "p1_bsdf_cand", "gi_init"]
              + [f"gi_bounce{i}" for i in range(cfg.gi_bounces)])

    # ---------- 3. standalone per-batch A/B
    for lbl, (o, d, live), coh in zip(labels, batches, coh_flags):
        occ = (float(jnp.mean(live.astype(jnp.float32)))
               if live is not None else 1.0)

        def t_flat(x, o, d, lv):
            o2 = (o[0] + x * 1e-20, o[1], o[2])
            h = restir.trace_closest_p(sa, o2, d, cfg, t_min=1e-4,
                                       coherent=coh, live=None)
            return x + h["area"][0] * 1e-9

        def t_live(x, o, d, lv):
            o2 = (o[0] + x * 1e-20, o[1], o[2])
            h = restir.trace_closest_p(sa, o2, d, cfg, t_min=1e-4,
                                       coherent=coh, live=lv)
            return x + h["area"][0] * 1e-9

        def t_brute(x, o, d, lv):
            from royaltracer_dx_tpu.ops.restir import (
                _chunked_rays, closest_hit_brute, _T_MAX)
            o2 = (o[0] + x * 1e-20, o[1], o[2])
            n = o2[0].shape[0]
            tn = jnp.full((n,), 1e-4, jnp.float32)
            tx = jnp.full((n,), _T_MAX, jnp.float32)
            if lv is not None:
                tx = jnp.where(lv, tx, -1.0)
            h = _chunked_rays(
                lambda oo, dd, a, bb: closest_hit_brute(
                    oo, dd, sa.tri_verts, t_min=a, t_max=bb),
                n, (o2, d, tn, tx), ((0.0,) * 3, (1.0,) * 3, 0.0, -1.0))
            return x + h.t[0] * 1e-9

        row = [f"  {lbl:13s} occ={occ:4.2f}"]
        for name, fn in (("flat", t_flat), ("flat+live", t_live),
                         ("brute+live", t_brute)):
            if name == "flat+live" and live is None:
                continue
            try:
                dt = slope(fn, (o, d, live))
                ns = dt / o[0].shape[0] * 1e9
                row.append(f"{name} {dt*1e3:7.1f} ms ({ns:5.1f} ns/r)")
            except Exception as e:
                row.append(f"{name} ERR {e!r:.60}")
        say("  ".join(row) + f"  [t={time.perf_counter()-t_start:.0f}s]")

    say(f"done [t={time.perf_counter()-t_start:.0f}s]")


if __name__ == "__main__":
    main()
