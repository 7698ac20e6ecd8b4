"""Round-5 part D: WHY does a trace cost 2-2.5x more inside a pass jit?

r5c (tunneled v5e, 1080p, 2.07M-ray batches, today's state): standalone
slopes on the REAL in-frame batches are p1_primary 25.9 ns/r (flat),
p1_bsdf_cand 37.1 (flat+live), gi_init/bounces ~40 (brute+live) — yet
the in-frame ticks imply ~106 ns/r for the GI chain and ~2.5x for
pass1_di's traces (r4w: a gi_bounce jit = 228 ms of which trace 219,
while the same trace alone = ~101 ms flat / ~84 ms brute and the math
alone = ~9 ms).  Composing trace + consumer math in ONE XLA program
costs ~2x the trace.  Dead-lane retirement was a frame-level wash
(2727.5 vs 2728.0 ms) despite winning 27% standalone on p1_bsdf_cand.

This script discriminates between the candidate mechanisms with cheap
patches on ONE real gi_bounce (bounce 0 state) and on pass1_di:

  full          the pass body as shipped (baseline)
  barrier       lax.optimization_barrier around every trace's inputs and
                outputs (kills cross-fusion/CSE with the surrounding
                math but keeps one program)
  brute         cfg.accel="brute" (the simple [N, chunk] MT sweep in
                place of the flat window machinery — does the flat
                sweep's big per-tile temps compose badly?)
  brute+barrier both
  trace_only    the captured continuation trace standalone (control)
  trace_stub    the pass body with the trace replaced by a shape+dep
                preserving fake (control: the non-trace floor)

If barrier ~ trace_only + trace_stub: ship barriers around the trace
call sites (one-line fix).  If brute composes at its standalone rate:
flip the scattered-batch dispatch to brute at flat scenes regardless of
N (r3t's standalone crossover is invalid in-frame).  If neither: the
pass bodies must split at trace boundaries into separate dispatches
(r5a measured dispatch boundaries at ~4 ms each — cheap enough).

Run alone (single tunneled chip).  argv: W H (default 1920 1080).
"""

import dataclasses
import os
import sys
import time

PARTS = set(os.environ.get("R5D_PARTS", "gb,p1").split(","))

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


ORIG_CLOSEST = restir.trace_closest_p
ORIG_OCCLUDED = restir.trace_occluded


def barrier_closest(scene_, o, d, cfg_, t_min=1e-4, coherent=True,
                    live=None):
    o, d = restir.as_planes3(o), restir.as_planes3(d)
    if live is None:
        o, d = jax.lax.optimization_barrier((o, d))
    else:
        o, d, live = jax.lax.optimization_barrier((o, d, live))
    h = ORIG_CLOSEST(scene_, o, d, cfg_, t_min=t_min, coherent=coherent,
                     live=live)
    return jax.lax.optimization_barrier(h)


def barrier_occluded(scene_, o, d, t_min, t_max, cfg_):
    o, d = restir.as_planes3(o), restir.as_planes3(d)
    o, d, t_min, t_max = jax.lax.optimization_barrier(
        (o, d, jnp.asarray(t_min, jnp.float32),
         jnp.asarray(t_max, jnp.float32)))
    return jax.lax.optimization_barrier(
        ORIG_OCCLUDED(scene_, o, d, t_min, t_max, cfg_))


def stub_closest(scene_, o, d, cfg_, t_min=1e-4, coherent=True, live=None):
    """Shape + data-dependence preserving fake hit (no traversal)."""
    o, d = restir.as_planes3(o), restir.as_planes3(d)
    pos = pv.add(o, d)
    nrm = pv.normalize(d)
    mid = (jnp.abs(pos[0]).astype(jnp.int32)
           % max(1, scene_.materials.count))
    return dict(pos=pos, normal=pv.neg(nrm),
                area=jnp.abs(d[0]) + 0.5,
                mid=mid, obj=jnp.zeros_like(mid),
                valid=d[0] > -2.0)


class patched:
    def __init__(self, closest=None, occluded=None):
        self.c, self.o = closest, occluded

    def __enter__(self):
        if self.c:
            restir.trace_closest_p = self.c
        if self.o:
            restir.trace_occluded = self.o

    def __exit__(self, *a):
        restir.trace_closest_p = ORIG_CLOSEST
        restir.trace_occluded = ORIG_OCCLUDED


def main():
    t_start = time.perf_counter()
    say("device:", jax.devices()[0])
    scene, camera = build_scene("reference")
    W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1920, 1080)
    cfg = RenderConfig(width=W, height=H)
    cfg_brute = dataclasses.replace(cfg, traversal="brute")

    ren = rr.RestirRenderer(scene, camera, cfg)
    sa = ren.scene_arrays
    cam = ren._camera_arrays()
    frame = jnp.uint32(7)

    # ---- materialize the real bounce-0 state + the trace batch it issues
    @jax.jit
    def mk_state():
        res_di, sdata, gi_in, seed = rr.pass1_di.__wrapped__(
            sa, cam, frame, cfg)
        st = restir_gi.gi_init(sa, cfg, gi_in["x1"], gi_in["n1"],
                               gi_in["o"], gi_in["mid"], seed,
                               live=gi_in["sampling"])
        st["active"] = st["active"] & gi_in["sampling"]
        return st

    st0 = jax.tree.map(np.asarray, mk_state())   # concrete host copy
    st0 = jax.tree.map(jnp.asarray, st0)
    say(f"state ready [t={time.perf_counter()-t_start:.0f}s]")

    cap = []

    @jax.jit
    def capture(st):
        def spy(scene_, o, d, cfg_, t_min=1e-4, coherent=True, live=None):
            cap.append((restir.as_planes3(o), restir.as_planes3(d), live))
            return ORIG_CLOSEST(scene_, o, d, cfg_, t_min=t_min,
                                coherent=coherent, live=live)
        with patched(closest=spy):
            restir_gi.gi_bounce(sa, cfg, st, jnp.uint32(0))
        return cap[0]

    o_c, d_c, live_c = jax.tree.map(jnp.asarray,
                                    jax.tree.map(np.asarray, capture(st0)))
    n = o_c[0].shape[0]
    say(f"captured continuation batch n={n} "
        f"[t={time.perf_counter()-t_start:.0f}s]")

    # ------------------------------------------------ gi_bounce ladder
    # cfg is a static dataclass, NOT a jit-arg: it must ride in closures
    def mk_gb(cfgv):
        def gb(x, st):
            st = dict(st)
            st["origin"] = (st["origin"][0] + x * 1e-20, st["origin"][1],
                            st["origin"][2])
            out = restir_gi.gi_bounce(sa, cfgv, st, jnp.uint32(0))
            return (x + out["acc_l"][0][0] * 1e-9
                    + out["seed"].ravel()[0].astype(jnp.float32) * 1e-12)
        return gb

    def mk_trace(cfgv):
        def t_trace(x, o, d, lv):
            o2 = (o[0] + x * 1e-20, o[1], o[2])
            h = ORIG_CLOSEST(sa, o2, d, cfgv, t_min=restir.S_BIAS,
                             coherent=False, live=lv)
            return x + h["area"][0] * 1e-9
        return t_trace

    rows = [
        ("gb full", lambda: slope(mk_gb(cfg), (st0,))),
        ("gb barrier", lambda: (
            patched(closest=barrier_closest).__enter__(),
            slope(mk_gb(cfg), (st0,)))[1]),
        ("gb brute", lambda: slope(mk_gb(cfg_brute), (st0,))),
        ("gb brute+barrier", lambda: (
            patched(closest=barrier_closest).__enter__(),
            slope(mk_gb(cfg_brute), (st0,)))[1]),
        ("gb trace_stub", lambda: (
            patched(closest=stub_closest).__enter__(),
            slope(mk_gb(cfg), (st0,)))[1]),
        ("trace_only flat", lambda: slope(mk_trace(cfg), (o_c, d_c, live_c))),
        ("trace_only brute", lambda: slope(
            mk_trace(cfg_brute), (o_c, d_c, live_c))),
    ]
    for lbl, fn in (rows if 'gb' in PARTS else []):
        try:
            dt = fn()
            say(f"  {lbl:18s} {dt*1e3:8.1f} ms ({dt/n*1e9:5.1f} ns/r)"
                f"  [t={time.perf_counter()-t_start:.0f}s]")
        except Exception as e:
            say(f"  {lbl:18s} ERR {e!r:.100}")
        finally:
            restir.trace_closest_p = ORIG_CLOSEST
            restir.trace_occluded = ORIG_OCCLUDED

    # ------------------------------------------------ pass1_di ladder
    def mk_p1(cfgv):
        def p1(x, camv):
            camv = dict(camv)
            camv["view_inv"] = camv["view_inv"] + x * 1e-20
            res_di, sdata, gi_in, seed = rr.pass1_di.__wrapped__(
                sa, camv, frame, cfgv)
            return (x + res_di["w"][0] * 1e-9
                    + sdata["x1"][0][0] * 1e-12)
        return p1

    p1rows = [
        ("p1 full", lambda: slope(mk_p1(cfg), (cam,))),
        ("p1 barrier", lambda: (
            patched(closest=barrier_closest,
                    occluded=barrier_occluded).__enter__(),
            slope(mk_p1(cfg), (cam,)))[1]),
        ("p1 brute", lambda: slope(mk_p1(cfg_brute), (cam,))),
        ("p1 trace_stub", lambda: (
            patched(closest=stub_closest).__enter__(),
            slope(mk_p1(cfg), (cam,)))[1]),
    ]
    for lbl, fn in (p1rows if 'p1' in PARTS else []):
        try:
            dt = fn()
            say(f"  {lbl:18s} {dt*1e3:8.1f} ms"
                f"  [t={time.perf_counter()-t_start:.0f}s]")
        except Exception as e:
            say(f"  {lbl:18s} ERR {e!r:.100}")
        finally:
            restir.trace_closest_p = ORIG_CLOSEST
            restir.trace_occluded = ORIG_OCCLUDED

    say(f"done [t={time.perf_counter()-t_start:.0f}s]")


if __name__ == "__main__":
    main()
