"""Round-5 part G: honest closest-epilogue strategy A/B (flat path).

r5f showed the one-lane harness DCE'd the sweep's u/v/tri carries out of
EVERY prior epilogue study (r4l/r4m/r4m2 and the knob-doc conclusions):
XLA's while-loop simplifier deletes dead tuple carries, so "argmin" rows
measured as find-mode and defer could never show its win.  This script
re-runs the A/B with the consume-everything harness on the REAL 1080p
frame batches (p1 primary / p1 bsdf candidate / gi_bounce0), flipping
``_CLOSEST_EPILOGUE_FLAT`` with ``jax.clear_caches()`` between rows:

  tr_<b> argmin   full sweep, (t, slot, u, v) carry (shipping default)
  tr_<b> defer    (t, slot) carry + one _slot_uv reconstruction
  tr_<b> find     (t,) carry only — the floor (misses slot/u/v; lower
                  bound, not a product config)
  gb argmin/defer gi_bounce composed (trace + bounce math)

All rows consume every output (r5e harness).  Run alone on the chip.
argv: W H (default 1920 1080).
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
from royaltracer_dx_tpu.ops import stream_trace as stx
from royaltracer_dx_tpu.render import restir_renderer as rr

T0 = time.perf_counter()


def say(*a):
    print(*a, flush=True)


def consume(tree):
    tot = jnp.float32(0.0)
    for a in jax.tree.leaves(tree):
        a = jnp.asarray(a)
        if a.dtype != jnp.float32:
            a = a.astype(jnp.float32)
        tot = tot + jnp.sum(a) * jnp.float32(1e-9)
    return tot


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


def row(lbl, n, fn, *args):
    try:
        dt = slope(fn, args)
        say(f"  {lbl:22s} {dt*1e3:8.1f} ms ({dt/n*1e9:5.1f} ns/r)"
            f"  [t={time.perf_counter()-T0:.0f}s]")
        return dt
    except Exception as e:
        say(f"  {lbl:22s} ERR {e!r:.110}")


def set_epilogue(mode):
    stx._CLOSEST_EPILOGUE_FLAT = mode
    stx._CLOSEST_EPILOGUE = mode
    jax.clear_caches()


def main():
    say("device:", jax.devices()[0])
    scene, camera = build_scene("reference")
    W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1920, 1080)
    cfg = RenderConfig(width=W, height=H)
    ren = rr.RestirRenderer(scene, camera, cfg)
    sa = ren.scene_arrays
    cam = ren._camera_arrays()
    frame = jnp.uint32(7)
    ren.render()
    ren.render()
    say(f"2 frames rendered [t={time.perf_counter()-T0:.0f}s]")

    ORIG = restir.trace_closest_p

    @jax.jit
    def mk_state(camv):
        cap = []

        def spy(scene_, o, d, cfg_, t_min=1e-4, coherent=True, live=None):
            cap.append((restir.as_planes3(o), restir.as_planes3(d), live))
            return ORIG(scene_, o, d, cfg_, t_min=t_min,
                        coherent=coherent, live=live)
        restir.trace_closest_p = spy
        try:
            res_di, sdata, gi_in, seed = rr.pass1_di.__wrapped__(
                sa, camv, frame, cfg)
            st = restir_gi.gi_init(sa, cfg, gi_in["x1"], gi_in["n1"],
                                   gi_in["o"], gi_in["mid"], seed,
                                   live=gi_in["sampling"])
            st["active"] = st["active"] & gi_in["sampling"]
            st_pre = dict(st)
            restir_gi.gi_bounce(sa, cfg, st, jnp.uint32(0))
        finally:
            restir.trace_closest_p = ORIG
        return st_pre, tuple(cap)

    st0, caps = jax.tree.map(jnp.asarray,
                             jax.tree.map(np.asarray, mk_state(cam)))
    (b_prim, b_cand, _b_giinit, b_gi) = caps
    n = b_gi[0][0].shape[0]
    say(f"state + batches ready, n={n} [t={time.perf_counter()-T0:.0f}s]")

    def mk_tr(what, batch):
        o, d, lv = batch

        def tr(x, o, d):
            o2 = (o[0] + x * 1e-20, o[1], o[2])
            if what == "find":
                occ = restir.trace_occluded(
                    sa, o2, d, jnp.zeros_like(o[0]),
                    jnp.zeros_like(o[0]) + 1e30, cfg)
                return x + consume(occ)
            h = ORIG(sa, o2, d, cfg, t_min=restir.S_BIAS, coherent=False)
            return x + consume(h)
        return tr, (o, d)

    # find floor: occlusion-mode sweep carries best_t only — cheapest
    # possible carry on identical worklists (NOT a closest result; bound
    # only)
    for lbl, batch in (("prim", b_prim), ("cand", b_cand), ("gi", b_gi)):
        for epi in ("argmin", "defer"):
            set_epilogue(epi)
            fn, args = mk_tr("full", batch)
            row(f"tr_{lbl} {epi}", n, fn, *args)
    set_epilogue("argmin")
    for lbl, batch in (("prim", b_prim), ("gi", b_gi)):
        fn, args = mk_tr("find", batch)
        row(f"tr_{lbl} find(occ)", n, fn, *args)

    def mk_gb():
        def gb(x, st):
            st = dict(st)
            st["origin"] = (st["origin"][0] + x * 1e-20, st["origin"][1],
                            st["origin"][2])
            out = restir_gi.gi_bounce(sa, cfg, st, jnp.uint32(0))
            return x + consume(out)
        return gb

    for epi in ("argmin", "defer"):
        set_epilogue(epi)
        row(f"gb {epi}", n, mk_gb(), st0)
    set_epilogue("argmin")

    say(f"done [t={time.perf_counter()-T0:.0f}s]")


if __name__ == "__main__":
    main()
