"""Round-5 part I: pass-3 / pass-2 gather-vs-math split + try-fill CDF.

Rows (1080p, real post-pass2 inputs, consume-everything harness):
  p3 full         pass3_spatial as shipped
  p3 nogather     _tap_gather stubbed to a broadcast row-0 fetch (keeps
                  shapes/deps; removes the 45 packed-record row gathers)
  p3 novis+nog    + visibility stubbed (pure math floor)
  p2 full/nogather  same for pass2_temporal (5 reprojection gathers)

Fill CDF: fraction of RELEVANT lanes (shading, non-sentinel mid) whose
accept count reaches k=3 after each spatial try, for the DI and GI
chains — decides whether a bit-identical global early-exit
(lax.while_loop on all-filled) can skip tail tries, and what a reduced
spatial_max_tries would cost in accepts.

Run alone on the chip.  argv: W H (default 1920 1080)."""

import os
import sys
import time

import jax

if os.environ.get("R5_CPU") == "1":   # validation runs (axon plugin
    jax.config.update("jax_platforms", "cpu")  # ignores JAX_PLATFORMS)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import royaltracer_dx_tpu.cache  # noqa: F401
from royaltracer_dx_tpu.cli import build_scene
from royaltracer_dx_tpu.config import RenderConfig
from royaltracer_dx_tpu.ops import restir
from royaltracer_dx_tpu.render import restir_renderer as rr
from royaltracer_dx_tpu.utils import pvec as pv

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


ORIG_TAP = rr._tap_gather
ORIG_VIS = restir.visibility_batch_p


def stub_tap(table, idx):
    return jnp.broadcast_to(table[:1] + (idx[:1, None] * 0).astype(
        table.dtype), (idx.shape[0],) + table.shape[1:])


def stub_vis(scene_, queries, cfg_):
    return [jnp.abs(q[0][0]) * 0.0 + 1.0 for q in queries]


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
        res_di2, res_gi2 = rr.pass2_temporal.__wrapped__(
            sa, camv, frame, res_di, res_gi, sdata, packed_di,
            packed_gi, cfg)
        return res_di2, res_gi2, sdata, res_di, res_gi, packed_di, packed_gi

    p3in = jax.tree.map(jnp.asarray, jax.tree.map(np.asarray, (
        mk_p3_inputs(cam, ren.last_di, ren.last_gi, ren.last_sdata))))
    res_di2, res_gi2, sdata2, res_di1, res_gi1, pk_di, pk_gi = p3in
    n = sdata2["mid"].shape[0]
    say(f"inputs ready n={n} [t={time.perf_counter()-T0:.0f}s]")

    def row(lbl, fn, *args):
        try:
            dt = slope(fn, args)
            say(f"  {lbl:22s} {dt*1e3:8.1f} ms ({dt/n*1e9:5.1f} ns/r)"
                f"  [t={time.perf_counter()-T0:.0f}s]")
            return dt
        except Exception as e:
            say(f"  {lbl:22s} ERR {e!r:.110}")
        finally:
            rr._tap_gather = ORIG_TAP
            restir.visibility_batch_p = ORIG_VIS

    def mk_p3(tap=None, vis=None):
        def p3(x, camv, a, b, c):
            camv = dict(camv)
            camv["view_inv"] = camv["view_inv"] + x * 1e-20
            if tap:
                rr._tap_gather = tap
            if vis:
                restir.visibility_batch_p = vis
            try:
                out = rr.pass3_spatial.__wrapped__(
                    sa, camv, frame, a, b, c, cfg)
            finally:
                rr._tap_gather = ORIG_TAP
                restir.visibility_batch_p = ORIG_VIS
            return x + consume(out)
        return p3

    row("p3 full", mk_p3(), cam, res_di2, res_gi2, sdata2)
    row("p3 nogather", mk_p3(tap=stub_tap), cam, res_di2, res_gi2, sdata2)
    row("p3 nog+novis", mk_p3(tap=stub_tap, vis=stub_vis),
        cam, res_di2, res_gi2, sdata2)

    def mk_p2(tap=None):
        def p2(x, camv, a, b, c, pd, pg):
            camv = dict(camv)
            camv["view_inv"] = camv["view_inv"] + x * 1e-20
            if tap:
                rr._tap_gather = tap
            try:
                out = rr.pass2_temporal.__wrapped__(
                    sa, camv, frame, a, b, c, pd, pg, cfg)
            finally:
                rr._tap_gather = ORIG_TAP
            return x + consume(out)
        return p2

    row("p2 full", mk_p2(), cam, res_di1, res_gi1, sdata2, pk_di, pk_gi)
    row("p2 nogather", mk_p2(tap=stub_tap),
        cam, res_di1, res_gi1, sdata2, pk_di, pk_gi)

    # ---- try-fill CDF (DI + GI accept chains, k=3, 9 tries)
    @jax.jit
    def fill_cdf(camv, a, b, c, pdi, pgi):
        xs, ys = rr._pixel_grid(cfg)
        seed = rr.pixel_seed(xs, ys, 3, frame)
        cam_pos = tuple(camv["view_inv"][cc, 3] for cc in range(3))
        sdata, cur_di, cur_gi = c, a, b
        shading = ~((sdata["l1"][0] != 0.0) | (sdata["l1"][1] != 0.0)
                    | (sdata["l1"][2] != 0.0))
        mat = restir.fetch_material_p(sa, sdata["mid"])
        relevant = shading & ~rr._sentinel(sdata["mid"])
        k = cfg.spatial_candidate_count
        out_di, out_gi, acc_di, acc_gi = [], [], [], []
        cnt = jnp.zeros(xs.shape, rr._I)
        for t in range(cfg.spatial_max_tries):
            pidx_t, is_center_t = rr._spatial_try_at(xs, ys, cfg, seed, t,
                                                     0, None)
            r0 = rr._tap_gather(pdi[0], pidx_t).astype(rr._F)
            c_mid = r0[:, 6].astype(rr._I)
            accept_t = (
                ~is_center_t
                & ~restir.reject_normal_p(
                    sdata["n1"], (r0[:, 3], r0[:, 4], r0[:, 5]), 0.9)
                & ~restir.reject_distance_p(
                    sdata["x1"], (r0[:, 0], r0[:, 1], r0[:, 2]),
                    cam_pos, 0.1)
                & (r0[:, 7] == 3.0)
                & ~rr._sentinel(c_mid)
                & (c_mid == sdata["mid"])
            )
            cnt = cnt + accept_t.astype(rr._I)
            out_di.append(jnp.mean(jnp.where(
                relevant, (cnt >= k).astype(jnp.float32), 1.0)))
            acc_di.append(jnp.mean(jnp.where(
                relevant, accept_t.astype(jnp.float32), 0.0)))
        rough_ok = mat["rough"] > 0.3
        cnt = jnp.zeros(xs.shape, rr._I)
        for t in range(cfg.spatial_max_tries):
            pidx_t, is_center_t = rr._spatial_try_at(xs, ys, cfg, seed, t,
                                                     0, None)
            g0 = rr._tap_gather(pgi[0], pidx_t).astype(rr._F)
            g1 = rr._tap_gather(pgi[1], pidx_t).astype(rr._F)
            g_x1 = (g0[:, 0], g0[:, 1], g0[:, 2])
            g_mid = g0[:, 6].astype(rr._I)
            g_xn = (g1[:, 0], g1[:, 1], g1[:, 2])
            g_nn = (g1[:, 3], g1[:, 4], g1[:, 5])
            jac = restir.jacobian_reconnection_p(g_x1, sdata["x1"], g_xn,
                                                 g_nn)
            accept_t = (
                ~is_center_t
                & rough_ok
                & ~restir.reject_distance_p(sdata["x1"], g_x1, cam_pos, 0.1)
                & ~restir.reject_below_surface_p(
                    pv.normalize(pv.sub(g_xn, sdata["x1"])), sdata["n1"])
                & ~restir.reject_w_sum(g1[:, 6], cfg.w_sum_threshold)
                & (g0[:, 7] == 3.0)
                & ~restir.reject_jacobian(jac, cfg.j_threshold)
                & ~rr._sentinel(g_mid)
                & (g_mid == sdata["mid"])
            )
            cnt = cnt + accept_t.astype(rr._I)
            out_gi.append(jnp.mean(jnp.where(
                relevant, (cnt >= k).astype(jnp.float32), 1.0)))
            acc_gi.append(jnp.mean(jnp.where(
                relevant, accept_t.astype(jnp.float32), 0.0)))
        return (jnp.stack(out_di), jnp.stack(acc_di),
                jnp.stack(out_gi), jnp.stack(acc_gi),
                jnp.mean(relevant.astype(jnp.float32)))

    # NOTE: pass2 consumed the packed tables for reprojection; pass3
    # repacks CURRENT-frame candidates.  For the CDF we want pass3's
    # tables: rebuild them the way pass3_spatial does.
    @jax.jit
    def mk_packed(a, b, c):
        rd = rr._rec_dtype(cfg)
        return (rr._pack_record(c, a, rr._DI_KEYS, rd),
                rr._pack_record(c, b, rr._GI_KEYS, rd))

    pdi3, pgi3 = mk_packed(res_di2, res_gi2, sdata2)
    cdf_di, acc_di, cdf_gi, acc_gi, rel = [
        np.asarray(x) for x in fill_cdf(cam, res_di2, res_gi2, sdata2,
                                        pdi3, pgi3)]
    say(f"relevant lanes: {rel:.4f}")
    say("DI filled>=3 CDF:", [round(float(x), 4) for x in cdf_di])
    say("DI accept rate/try:", [round(float(x), 4) for x in acc_di])
    say("GI filled>=3 CDF:", [round(float(x), 4) for x in cdf_gi])
    say("GI accept rate/try:", [round(float(x), 4) for x in acc_gi])
    say(f"done [t={time.perf_counter()-T0:.0f}s]")


if __name__ == "__main__":
    main()
