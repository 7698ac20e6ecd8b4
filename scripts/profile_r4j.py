"""Round-4 part J: decompose pass-3's ~1.5 s of NON-trace work at 1080p.

r4e/r4a: pass3_spatial = 2203 ms, of which visibility traces ~705 ms.
The remaining ~1.5 s is resampling math + table gathers.  This script
times pass3 with ALL visibility stubbed (the non-vis baseline), then
ablates: p_hat evals, reservoir updates, jacobians; memoizes duplicate
p_hat/jacobian call sites (the DI noncanonical loop recomputes the MIS
loop's p_from exactly; GI recomputes p_hat AND jacobian) to learn
whether XLA already CSEs them; and times the try/payload gathers
standalone.

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
from royaltracer_dx_tpu.ops import restir, reservoir as resv
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


CALLS = {"di": 0, "gi": 0, "jac": 0, "upd": 0, "vis": 0}


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
    st = rr.pass1_gi_init(sa, gi_in, seed, cfg)
    for b in range(cfg.gi_bounces):
        st = rr.pass1_gi_bounce(sa, cfg, st, jnp.uint32(b))
    res_gi, _ = rr.pass1_gi_final(sa, gi_in, st, cfg)
    jax.block_until_ready(res_di["w_sum"])
    say("pass1 inputs ready")

    real = dict(
        vis_check=restir.visibility_check_p,
        vis_batch=restir.visibility_batch_p,
        p_di=restir.get_p_hat_di_p,
        p_gi=restir.get_p_hat_gi_p,
        jac=restir.jacobian_reconnection_p,
        upd=rr.update_reservoir_p,
    )

    # ---- stubs ----------------------------------------------------------
    def vis_check_stub(scene_, x1, n1, d, dist, cfg_):
        CALLS["vis"] += 1
        return jnp.ones_like(dist)

    def vis_batch_stub(scene_, queries, cfg_):
        CALLS["vis"] += len(queries)
        return [jnp.ones_like(q[0][0]) for q in queries]

    def p_di_stub(scene_, x1, n1, x2, n2, l2, outgoing, mat,
                  use_visibility, cfg_, vis_mask=None):
        CALLS["di"] += 1
        return pv.dot(x2, x1) * 1e-6 + 0.5

    def p_gi_stub(scene_, x1, n1, xn, e3, outgoing, mat,
                  use_visibility, cfg_, vis_mask=None):
        CALLS["gi"] += 1
        v = pv.dot(xn, x1) * 1e-6 + 0.3
        return (v, v, v)

    def jac_stub(x1_r, x1_q, x2q, n2q):
        CALLS["jac"] += 1
        return pv.dot(x1_r, x1_q) * 0.0 + 1.0

    def upd_stub(res_, keys, ok, wi, m_add, vals, seed_):
        CALLS["upd"] += 1
        return res_, ok, seed_ + jnp.uint32(1)

    def memo(fn):
        cache = {}

        def key_of(a):
            if isinstance(a, (tuple, list)):
                return tuple(key_of(x) for x in a)
            if isinstance(a, dict):
                return tuple((k, key_of(v)) for k, v in sorted(a.items()))
            try:
                hash(a)
                return a
            except TypeError:
                return id(a)

        def wrapped(*args, **kw):
            k = (tuple(key_of(a) for a in args),
                 tuple(sorted((kk, key_of(vv)) for kk, vv in kw.items())))
            if k not in cache:
                cache[k] = fn(*args, **kw)
            return cache[k]
        wrapped._cache = cache
        return wrapped

    def set_fns(vis=None, p_di=None, p_gi=None, jac=None, upd=None):
        restir.visibility_check_p = vis or real["vis_check"]
        restir.visibility_batch_p = (vis_batch_stub if vis else
                                     real["vis_batch"])
        restir.get_p_hat_di_p = p_di or real["p_di"]
        restir.get_p_hat_gi_p = p_gi or real["p_gi"]
        restir.jacobian_reconnection_p = jac or real["jac"]
        rr.update_reservoir_p = upd or real["upd"]

    p3_args = (res_di, res_gi, sdata)

    def run_pass3(x, rdi=None, rgi=None, sd0=None):
        if rdi is None:
            rdi, rgi, sd0 = p3_args
        sd = dict(sd0)
        sd["x1"] = tuple(c + x * 1e-20 for c in sd["x1"])
        # __wrapped__: bypass pass3's own jit so each variant's stubs are
        # re-traced (the jitted wrapper CACHES the first variant's trace
        # and silently ignores monkeypatches — r4j run 2)
        rad, shading, out_di, out_gi = rr.pass3_spatial.__wrapped__(
            sa, cam, frame, dict(rdi), dict(rgi), sd, cfg)
        return x + rad[0, 0] * 1e-9 + out_di["w"][0] * 1e-9

    variants = [
        ("FULL (real vis)", dict()),
        ("novis baseline", dict(vis=vis_check_stub)),
        ("novis + p_hat_di stub", dict(vis=vis_check_stub, p_di=p_di_stub)),
        ("novis + p_hat_gi stub", dict(vis=vis_check_stub, p_gi=p_gi_stub)),
        ("novis + both p_hat stubs", dict(vis=vis_check_stub,
                                          p_di=p_di_stub, p_gi=p_gi_stub)),
        ("novis + jacobian stub", dict(vis=vis_check_stub, jac=jac_stub)),
        ("novis + reservoir-upd stub", dict(vis=vis_check_stub,
                                            upd=upd_stub)),
        ("novis + ALL stubs", dict(vis=vis_check_stub, p_di=p_di_stub,
                                   p_gi=p_gi_stub, jac=jac_stub,
                                   upd=upd_stub)),
    ]
    for name, fns in variants:
        for k in CALLS:
            CALLS[k] = 0
        set_fns(**fns)
        dt = slope(run_pass3, p3_args)
        say(f"  {name:28s}: {dt*1e3:8.1f} ms   calls={dict(CALLS)}")

    # memoized real p_hats/jacobian: if XLA already CSEs duplicate call
    # sites this matches the novis baseline; if it's faster, manual CSE
    # in pass3 is worth shipping
    set_fns(vis=vis_check_stub)

    def run_pass3_memo(x, rdi, rgi, sd0):
        restir.get_p_hat_di_p = memo(real["p_di"])
        restir.get_p_hat_gi_p = memo(real["p_gi"])
        restir.jacobian_reconnection_p = memo(real["jac"])
        try:
            return run_pass3(x, rdi, rgi, sd0)
        finally:
            restir.get_p_hat_di_p = real["p_di"]
            restir.get_p_hat_gi_p = real["p_gi"]
            restir.jacobian_reconnection_p = real["jac"]

    dt = slope(run_pass3_memo, p3_args)
    say(f"  {'novis + MEMO p_hat/jac':28s}: {dt*1e3:8.1f} ms")

    set_fns()

    # ---- standalone gather block: the T try-gathers + 6k payload rows
    rd = rr._rec_dtype(cfg)
    packed_di = rr._pack_record(sdata, res_di, rr._DI_KEYS, rd)
    packed_gi = rr._pack_record(sdata, res_gi, rr._GI_KEYS, rd)
    xs, ys = rr._pixel_grid(cfg)
    pidx, is_center, _ = rr._spatial_tries(
        xs, ys, cfg, rr.pixel_seed(xs, ys, 3, frame))
    say(f"tries T={pidx.shape[0]} k={cfg.spatial_candidate_count}")

    def run_gathers(x, packed_di, packed_gi, pidx):
        pix = (pidx + x.astype(jnp.int32) * 0) % n
        acc = x
        for tab in (packed_di, packed_gi):
            r0 = tab[0][pix].astype(jnp.float32)          # [T, N, 8]
            acc = acc + jnp.sum(r0[:, 0, :]) * 1e-12
            for v in range(cfg.spatial_candidate_count):
                r1 = tab[1][pix[v]].astype(jnp.float32)
                r2 = tab[2][pix[v]].astype(jnp.float32)
                acc = acc + r1[0, 0] * 1e-12 + r2[0, 0] * 1e-12
        return acc
    dt = slope(run_gathers, (packed_di, packed_gi, pidx))
    say(f"  {'gathers standalone (2T+12)':28s}: {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
