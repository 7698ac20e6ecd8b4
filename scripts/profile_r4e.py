"""Round-4 part E: where do pass-1's 1.11 s and pass-3's 1.21 s of
traces go at 1080p, and what batch granularity is fastest?

r3n attribution: pass 3 = 1941 ms of which visibility traces 1213 ms
(18.7M fused segments ~ 65 ns/lane vs the ~36 ns unit rate — the
lax.map chunk penalty r3i measured).  This script A/Bs the SAME
visibility workload traced as: one fused 9N batch (current), 3N groups,
2N groups, N-sized queries (no chunking), and with a raised chunk cap —
then ablates pass1_gi and pass1_di.

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
from royaltracer_dx_tpu.render import restir_renderer as rr
from royaltracer_dx_tpu.utils import pvec as pv


def say(*a):
    print(*a, flush=True)


def slope(fn, args, reps=(1, 3)):
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
    from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer
    r = RestirRenderer(scene, camera, cfg)
    sa = r.scene_arrays
    n = cfg.num_pixels
    say(f"{W}x{H} N={n}")

    r.render()
    jax.block_until_ready(r.fb.accum)
    cam = r._camera_arrays()
    frame = jnp.uint32(r.frame)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)
    jax.block_until_ready(res_di["w_sum"])

    # the real pass-3-like visibility workload: 9 queries from x1 toward
    # the current reservoir light point (same geometry class; accept
    # masks ~0.98 so all-live is representative)
    x1, n1 = sdata["x1"], sdata["n1"]
    x2 = res_di["x2"]
    live = gi_in["sampling"]

    def build_queries(kq):
        return [(x1, n1, x2, live) for _ in range(kq)]

    # ---- A. fused batch granularity
    for kq, label in ((9, "one fused 9N (current)"),
                      (3, "3 fused 3N groups"),
                      (2, "2N groups"),
                      (1, "9 separate N traces")):
        groups = 9 // kq

        def step(x, groups=groups, kq=kq):
            acc = x
            for _ in range(groups):
                qs = [(pv.add(x1, pv.splat(acc * 1e-20)), n1, x2, live)
                      for _ in range(kq)]
                vs = restir.visibility_batch_p(sa, qs, cfg)
                for v in vs:
                    acc = acc + v[0] * 1e-9
            return acc
        dt = slope(step, ())
        say(f"vis 9 queries as {label:24s}: {dt*1e3:8.1f} ms  "
            f"({dt/9/n*1e9:5.1f} ns/lane)")

    # ---- C. pass1_gi ablation: full, traces stubbed, NEE math stubbed
    def run_gi(x, gi_in, seed):
        gi = dict(gi_in)
        gi["x1"] = tuple(c + x * 0.0 for c in gi["x1"])
        st_ = rr.pass1_gi_init.__wrapped__(sa, gi, seed, cfg)
        for b in range(cfg.gi_bounces):
            st_ = rr.pass1_gi_bounce.__wrapped__(sa, cfg, st_, jnp.uint32(b))
        res_gi, _ = rr.pass1_gi_final.__wrapped__(sa, gi, st_, cfg)
        return x + res_gi["w_sum"][0] * 1e-12

    dt_full = slope(run_gi, (gi_in, seed))
    say(f"pass1_gi full:            {dt_full*1e3:8.1f} ms")

    real_tc = restir.trace_closest_p
    real_occ = restir.trace_occluded

    def stub_tc(scene_, origins, dirs, cfg_, t_min=1e-4, coherent=True):
        o = restir.as_planes3(origins)
        d = restir.as_planes3(dirs)
        pos = pv.add(o, d)
        zero = o[0] * 0.0
        return dict(pos=pos, normal=d, area=zero + 0.1,
                    mid=zero.astype(jnp.int32),
                    obj=zero.astype(jnp.int32),
                    valid=zero < 1.0)

    def stub_occ(scene_, origins, dirs, t_min, t_max, cfg_):
        o = restir.as_planes3(origins)
        return o[0] * 0.0 > 1.0

    restir.trace_closest_p = stub_tc
    restir.trace_occluded = stub_occ
    import royaltracer_dx_tpu.ops.restir_gi as rgi
    dt_notrace = slope(run_gi, (gi_in, seed))
    say(f"pass1_gi traces stubbed:  {dt_notrace*1e3:8.1f} ms   "
        f"(traces = {(dt_full-dt_notrace)*1e3:.1f} ms)")

    # also stub the NEE candidate math
    real_nee = restir.nee_candidates_p

    def stub_nee(scene_, x1_, normal, outgoing, mat, seed_, m_count):
        z = x1_[0] * 0.0
        zm = jnp.broadcast_to(z, (m_count,) + z.shape)
        zv = (zm, zm, zm)
        return dict(p_hat=zm + 0.1, pdf_light=zm + 1.0, pdf_bsdf=zm,
                    x2=zv, n2=zv, emission=zv, l_norm=zv, dist=zm + 1.0), seed_
    restir.nee_candidates_p = stub_nee
    rgi.restir.nee_candidates_p = stub_nee
    dt_nonee = slope(run_gi, (gi_in, seed))
    say(f"pass1_gi +NEE stubbed:    {dt_nonee*1e3:8.1f} ms   "
        f"(NEE math = {(dt_notrace-dt_nonee)*1e3:.1f} ms)")
    restir.nee_candidates_p = real_nee
    rgi.restir.nee_candidates_p = real_nee

    # ---- D. pass1_di ablation (traces stubbed)
    def run_di(x):
        cam2 = dict(cam)
        cam2["view_inv"] = cam["view_inv"] + x * 0.0
        res, sd, gi, s = rr.pass1_di.__wrapped__(sa, cam2, frame, cfg)
        return x + res["w_sum"][0] * 1e-12

    dt_di_nt = slope(run_di, ())
    say(f"pass1_di traces stubbed:  {dt_di_nt*1e3:8.1f} ms")
    restir.trace_closest_p = real_tc
    restir.trace_occluded = real_occ
    jax.clear_caches()
    dt_di = slope(run_di, ())
    say(f"pass1_di full:            {dt_di*1e3:8.1f} ms   "
        f"(traces = {(dt_di-dt_di_nt)*1e3:.1f} ms)")

    # ---- B. raised chunk cap on the fused batch
    old_cap = restir._TRACE_CHUNK_RAYS
    for cap_name, cap in (("1<<23 (8.4M)", 1 << 23),
                          ("1<<25 (no chunking)", 1 << 25)):
        restir._TRACE_CHUNK_RAYS = cap
        jax.clear_caches()

        def step9(x):
            qs = [(pv.add(x1, pv.splat(x * 1e-20)), n1, x2, live)
                  for _ in range(9)]
            vs = restir.visibility_batch_p(sa, qs, cfg)
            acc = x
            for v in vs:
                acc = acc + v[0] * 1e-9
            return acc
        try:
            dt = slope(step9, ())
            say(f"vis fused 9N, chunk cap {cap_name:18s}: {dt*1e3:8.1f} ms")
        except Exception as e:
            say(f"vis fused 9N, chunk cap {cap_name}: FAILED {repr(e)[:120]}")
    restir._TRACE_CHUNK_RAYS = old_cap
    jax.clear_caches()


if __name__ == "__main__":
    main()
