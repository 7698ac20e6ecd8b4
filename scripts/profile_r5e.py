"""Round-5 part E: fixed-consumption cost ledger for the 1080p frame.

The r3m/r4w/r5c/r5d standalone rows consumed ONE LANE of one output
(``h["area"][0]``, ``out["acc_l"][0][0]``): XLA pushes that slice
through every elementwise op and gather OUTSIDE the traversal loops, so
those rows dropped the hit-attributes epilogue (3 narrow gathers +
interpolation at 2.07M lanes) and, in stub rows, potentially the entire
pass math.  The "composition tax" (in-frame trace ~106 ns/r vs 26-50
standalone) may be partly or wholly that artifact.

This script re-measures with a consume-everything harness: every row's
output is reduced with full-lane sums (cost of the sums themselves is
row 0).  Ledger at 1920x1080 (2.07M lanes), garage reference scene:

  consume_ctl      the sums alone on precomputed planes (~1 ms)
  tr_* sweep       trace with only sum(valid) consumed  (sweep cost)
  tr_* full        trace with every output consumed     (sweep+epilogue)
      ... for the real gi_bounce0 continuation batch (flat, flat+live,
      brute+live) and the real p1 primary / p1 bsdf_cand batches
  gb full          gi_bounce, everything consumed (vs its 228 ms tick)
  gb stub          gi_bounce with a shape+dep-preserving fake trace
                   (true non-trace math floor)
  p1 full / stub   pass1_di, same treatment (vs its ~426 ms tick)
  p3 full / novis  pass3_spatial with real post-pass2 inputs (vs 1129)

Run alone (single tunneled chip).  argv: W H (default 1920 1080).
"""

import dataclasses
import os
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

PARTS = set(os.environ.get("R5E_PARTS", "tr,gb,p1,p3").split(","))


def say(*a):
    print(*a, flush=True)


def consume(tree):
    """Full-lane reduction of every array in the pytree (defeats XLA
    lane-slicing DCE; the sums themselves are ~free — see consume_ctl)."""
    tot = jnp.float32(0.0)
    for a in jax.tree.leaves(tree):
        a = jnp.asarray(a)
        if a.dtype == jnp.bool_ or jnp.issubdtype(a.dtype, jnp.integer):
            a = a.astype(jnp.float32)
        elif a.dtype != jnp.float32:
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


ORIG_CLOSEST = restir.trace_closest_p
ORIG_OCCLUDED = restir.trace_occluded
ORIG_VIS_BATCH = restir.visibility_batch_p


def stub_closest(scene_, o, d, cfg_, t_min=1e-4, coherent=True, live=None):
    o, d = restir.as_planes3(o), restir.as_planes3(d)
    pos = pv.add(o, d)
    mid = (jnp.abs(pos[0]).astype(jnp.int32)
           % max(1, scene_.materials.count))
    return dict(pos=pos, normal=pv.neg(pv.normalize(d)),
                area=jnp.abs(d[0]) + 0.5,
                mid=mid, obj=jnp.zeros_like(mid),
                valid=d[0] > -2.0)


def stub_occluded(scene_, o, d, t_min, t_max, cfg_):
    o = restir.as_planes3(o)
    return (o[0] + t_max) < -1e30


def stub_vis_batch(scene_, queries, cfg_):
    return [jnp.abs(q[0][0]) * 0.0 + 1.0 for q in queries]


class patched:
    def __init__(self, closest=None, occluded=None, vis_batch=None):
        self.c, self.o, self.v = closest, occluded, vis_batch

    def __enter__(self):
        if self.c:
            restir.trace_closest_p = self.c
        if self.o:
            restir.trace_occluded = self.o
        if self.v:
            restir.visibility_batch_p = self.v
        return self

    def __exit__(self, *a):
        restir.trace_closest_p = ORIG_CLOSEST
        restir.trace_occluded = ORIG_OCCLUDED
        restir.visibility_batch_p = ORIG_VIS_BATCH


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

    # two real frames so the ping-pong last buffers are populated
    ren.render()
    ren.render()
    say(f"2 frames rendered [t={time.perf_counter()-t_start:.0f}s]")

    # ---- capture every closest batch p1+GI issues, + the gi_bounce state
    @jax.jit
    def mk_state(camv):
        cap = []

        def spy(scene_, o, d, cfg_, t_min=1e-4, coherent=True, live=None):
            cap.append((restir.as_planes3(o), restir.as_planes3(d), live))
            return ORIG_CLOSEST(scene_, o, d, cfg_, t_min=t_min,
                                coherent=coherent, live=live)
        with patched(closest=spy):
            res_di, sdata, gi_in, seed = rr.pass1_di.__wrapped__(
                sa, camv, frame, cfg)
            st = restir_gi.gi_init(sa, cfg, gi_in["x1"], gi_in["n1"],
                                   gi_in["o"], gi_in["mid"], seed,
                                   live=gi_in["sampling"])
            st["active"] = st["active"] & gi_in["sampling"]
            st_pre = dict(st)
            restir_gi.gi_bounce(sa, cfg, st, jnp.uint32(0))
        # captures: 0=p1_primary 1=p1_bsdf_cand 2=gi_init 3=gi_bounce0
        return st_pre, tuple(cap)

    st0, caps = jax.tree.map(jnp.asarray,
                             jax.tree.map(np.asarray, mk_state(cam)))
    (b_prim, b_cand, _b_giinit, b_gi) = caps
    n = b_gi[0][0].shape[0]
    say(f"state + {len(caps)} batches ready, n={n} "
        f"[t={time.perf_counter()-t_start:.0f}s]")

    def row(lbl, fn, *args):
        try:
            dt = slope(fn, args)
            say(f"  {lbl:22s} {dt*1e3:8.1f} ms ({dt/n*1e9:5.1f} ns/r)"
                f"  [t={time.perf_counter()-t_start:.0f}s]")
            return dt
        except Exception as e:
            say(f"  {lbl:22s} ERR {e!r:.110}")
        finally:
            restir.trace_closest_p = ORIG_CLOSEST
            restir.trace_occluded = ORIG_OCCLUDED
            restir.visibility_batch_p = ORIG_VIS_BATCH

    # ---------------- row 0: the consume harness itself
    hit_pre = jax.tree.map(jnp.asarray, jax.tree.map(np.asarray, jax.jit(
        lambda o, d: stub_closest(sa, o, d, cfg))(b_gi[0], b_gi[1])))
    row("consume_ctl", lambda x, h: x + consume(h) * (1.0 + x * 0.0),
        hit_pre)

    # ---------------- trace rows (sweep vs sweep+epilogue)
    def mk_tr(cfgv, what, live_mode, batch):
        o, d, lv = batch
        lv = lv if live_mode else None

        def tr(x, o, d, lv2):
            o2 = (o[0] + x * 1e-20, o[1], o[2])
            h = ORIG_CLOSEST(sa, o2, d, cfgv, t_min=restir.S_BIAS,
                             coherent=False, live=lv2)
            if what == "sweep":
                return x + jnp.sum(h["valid"].astype(jnp.float32)) * 1e-9
            return x + consume(h)
        return tr, (o, d, lv)

    if "tr" in PARTS:
        for lbl, batch in (("prim", b_prim), ("cand", b_cand),
                           ("gi", b_gi)):
            for mode, cfgv, lm in (("flat", cfg, False),
                                   ("flat+live", cfg, True),
                                   ("brute+live", cfg_brute, True)):
                if lm and batch[2] is None:
                    continue
                for what in ("sweep", "full"):
                    fn, args = mk_tr(cfgv, what, lm, batch)
                    row(f"tr_{lbl} {mode} {what}", fn, *args)

    # ---------------- gi_bounce rows
    def mk_gb(cfgv):
        def gb(x, st):
            st = dict(st)
            st["origin"] = (st["origin"][0] + x * 1e-20, st["origin"][1],
                            st["origin"][2])
            out = restir_gi.gi_bounce(sa, cfgv, st, jnp.uint32(0))
            return x + consume(out)
        return gb

    if "gb" in PARTS:
        row("gb full", mk_gb(cfg), st0)
        row("gb brute", mk_gb(cfg_brute), st0)
        with patched(closest=stub_closest):
            row("gb trace_stub", mk_gb(cfg), st0)

    # ---------------- pass1_di rows
    def mk_p1(cfgv):
        def p1(x, camv):
            camv = dict(camv)
            camv["view_inv"] = camv["view_inv"] + x * 1e-20
            out = rr.pass1_di.__wrapped__(sa, camv, frame, cfgv)
            return x + consume(out)
        return p1

    if "p1" in PARTS:
        row("p1 full", mk_p1(cfg), cam)
        with patched(closest=stub_closest, occluded=stub_occluded):
            row("p1 trace_stub", mk_p1(cfg), cam)

    # ---------------- pass3 rows (real post-pass2 inputs)
    if "p3" in PARTS:
        @jax.jit
        def mk_p3_inputs(camv, last_di, last_gi, last_sdata):
            res_di, sdata, gi_in, seed = rr.pass1_di.__wrapped__(
                sa, camv, frame, cfg)
            st = rr.pass1_gi_init(sa, gi_in, seed, cfg)
            for b in range(cfg.gi_bounces):
                st = rr.pass1_gi_bounce(sa, cfg, st, jnp.uint32(b))
            res_gi, _ = rr.pass1_gi_final(sa, gi_in, st, cfg)
            packed_di, packed_gi = rr._pack_last(
                last_di, last_gi, last_sdata, rr._rec_dtype(cfg))
            res_di, res_gi = rr.pass2_temporal.__wrapped__(
                sa, camv, frame, res_di, res_gi, sdata, packed_di,
                packed_gi, cfg)
            return res_di, res_gi, sdata

        p3in = jax.tree.map(jnp.asarray, jax.tree.map(np.asarray, (
            mk_p3_inputs(cam, ren.last_di, ren.last_gi, ren.last_sdata))))
        res_di2, res_gi2, sdata2 = p3in
        say(f"pass3 inputs ready [t={time.perf_counter()-t_start:.0f}s]")

        def mk_p3():
            def p3(x, camv, a, b, c):
                camv = dict(camv)
                camv["view_inv"] = camv["view_inv"] + x * 1e-20
                out = rr.pass3_spatial.__wrapped__(
                    sa, camv, frame, a, b, c, cfg)
                return x + consume(out)
            return p3

        row("p3 full", mk_p3(), cam, res_di2, res_gi2, sdata2)
        with patched(vis_batch=stub_vis_batch, occluded=stub_occluded):
            row("p3 novis", mk_p3(), cam, res_di2, res_gi2, sdata2)

    say(f"done [t={time.perf_counter()-t_start:.0f}s]")


if __name__ == "__main__":
    main()
