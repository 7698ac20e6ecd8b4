"""Round-3 part N: pass3_spatial internals at 1080p by ablation.

Slope-times the full pass, then variants with pieces stubbed out
(visibility traces -> all-visible, p_hat math -> constant, reservoir
updates -> no-op, spatial tries/gathers -> center pixel).  Differences
attribute the pass cost.  Run alone (single tunneled chip).
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
from royaltracer_dx_tpu.ops import restir
from royaltracer_dx_tpu.utils import pvec as pv


def say(*a):
    print(*a, flush=True)


def slope(fn, args, reps=(1, 3)):
    """fn(x, *args) -> scalar-ish; returns seconds per call."""
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
    say(f"{W}x{H} N={cfg.num_pixels} k={cfg.spatial_candidate_count} "
        f"tries={cfg.spatial_max_tries}")

    r.render()
    jax.block_until_ready(r.fb.accum)
    cam = r._camera_arrays()
    frame = jnp.uint32(r.frame)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)
    st = rr.pass1_gi_init(sa, gi_in, seed, cfg)
    for b in range(cfg.gi_bounces):
        st = rr.pass1_gi_bounce(sa, cfg, st, jnp.uint32(b))
    res_gi, _ = rr.pass1_gi_final(sa, gi_in, st, cfg)
    packed_di, packed_gi = rr._pack_last(
        r.last_di, r.last_gi, r.last_sdata, jnp.float32)
    cur_di, cur_gi = rr.pass2_temporal(
        sa, cam, frame, res_di, res_gi, sdata, packed_di, packed_gi, cfg)
    cur_di = jax.block_until_ready(cur_di)

    p3 = rr.pass3_spatial.__wrapped__  # un-jitted body

    def run_pass3(x, cur_di, cur_gi, sdata):
        sd = dict(sdata)
        sd["x1"] = tuple(c + x * 0.0 for c in sd["x1"])
        rad, shading, od, og = p3(sa, cam, frame, dict(cur_di),
                                  dict(cur_gi), sd, cfg)
        return x + rad[0][0] * 1e-12

    args = (cur_di, cur_gi, sdata)
    dt_full = slope(run_pass3, args)
    say(f"pass3 full:            {dt_full*1e3:8.1f} ms")

    # ---- ablation: visibility -> all ones
    real_vb = restir.visibility_batch_p
    real_vc = restir.visibility_check_p

    def stub_vb(scene_, queries, cfg_):
        return [jnp.ones_like(q[0][0]) for q in queries]

    def stub_vc(scene_, x1, n1, direction, dist, cfg_):
        return jnp.ones_like(dist)

    restir.visibility_batch_p = stub_vb
    restir.visibility_check_p = stub_vc
    dt_novis = slope(run_pass3, args)
    say(f"pass3 no-vis:          {dt_novis*1e3:8.1f} ms   "
        f"(vis traces = {(dt_full-dt_novis)*1e3:.1f} ms)")

    # ---- ablation: also p_hat math -> cheap length
    real_di = restir.get_p_hat_di_p
    real_gi = restir.get_p_hat_gi_p

    def stub_di(scene_, x1, n1, x2, n2, l2, outgoing, mat, use_vis, cfg_,
                **kw):
        return pv.length(x2) + pv.length(x1) * 1e-9

    def stub_gi(scene_, x1, n1, xn, e3, outgoing, mat, use_vis, cfg_, **kw):
        s = pv.length(xn) + pv.length(x1) * 1e-9
        return (s, s, s)

    restir.get_p_hat_di_p = stub_di
    restir.get_p_hat_gi_p = stub_gi
    dt_nophat = slope(run_pass3, args)
    say(f"pass3 no-vis no-phat:  {dt_nophat*1e3:8.1f} ms   "
        f"(p_hat math = {(dt_novis-dt_nophat)*1e3:.1f} ms)")
    restir.get_p_hat_di_p = real_di
    restir.get_p_hat_gi_p = real_gi

    # ---- ablation: reservoir updates -> no-op (keep vis stubbed)
    from royaltracer_dx_tpu.ops import reservoir as resmod
    real_ur = rr.update_reservoir_p

    def stub_ur(res, keys, ok, w_new, m_new, payload, seed_):
        return dict(res), ok, seed_

    rr.update_reservoir_p = stub_ur
    dt_nores = slope(run_pass3, args)
    say(f"pass3 no-vis no-resv:  {dt_nores*1e3:8.1f} ms   "
        f"(reservoir = {(dt_novis-dt_nores)*1e3:.1f} ms)")
    rr.update_reservoir_p = real_ur

    restir.visibility_batch_p = real_vb
    restir.visibility_check_p = real_vc

    # ---- pass1_di / pass2 full (slope) for the frame ledger
    def p1(x, cam_):
        cam2 = dict(cam_)
        cam2["view_inv"] = cam2["view_inv"] + x * 0.0
        rd, sd, gi, s = rr.pass1_di(sa, cam2, frame, cfg)
        return x + rd["w_sum"][0] * 1e-12
    dt = slope(p1, (cam,))
    say(f"pass1_di full:         {dt*1e3:8.1f} ms")

    def p2(x, cur_di, cur_gi, sdata, pd, pg):
        sd = dict(sdata)
        sd["x1"] = tuple(c + x * 0.0 for c in sd["x1"])
        d, g = rr.pass2_temporal.__wrapped__(
            sa, cam, frame, dict(cur_di), dict(cur_gi), sd, pd, pg, cfg)
        return x + d["w_sum"][0] * 1e-12
    dt = slope(p2, (res_di, res_gi, sdata, packed_di, packed_gi))
    say(f"pass2 full:            {dt*1e3:8.1f} ms")

    def gstep(x, st):
        st2 = dict(st)
        st2["acc_pdf"] = st2["acc_pdf"] + x * 0.0
        out = rr.pass1_gi_bounce.__wrapped__(sa, cfg, st2, jnp.uint32(1))
        return x + out["acc_pdf"][0] * 1e-12
    dt = slope(gstep, (st,))
    say(f"gi_bounce (brute):     {dt*1e3:8.1f} ms")

    # ---- pack cost alone
    def pk(x, sdata, cur_di, cur_gi):
        sd = dict(sdata)
        sd["x1"] = tuple(c + x * 0.0 for c in sd["x1"])
        pd = rr._pack_record(sd, cur_di, rr._DI_KEYS, jnp.float32)
        pg = rr._pack_record(sd, cur_gi, rr._GI_KEYS, jnp.float32)
        return x + pd[0][0, 0].astype(jnp.float32) * 1e-12
    dt = slope(pk, (sdata, cur_di, cur_gi))
    say(f"pack records:          {dt*1e3:8.1f} ms")

    # ---- spatial tries + S0 gathers + first-k alone
    def tg(x, sdata, cur_di):
        xs, ys = rr._pixel_grid(cfg)
        seed2 = rr.pixel_seed(xs, ys, 3, frame + jnp.uint32(x * 0.0))
        pd = rr._pack_record(sdata, cur_di, rr._DI_KEYS, jnp.float32)
        pidx, is_c, seed2 = rr._spatial_tries(xs, ys, cfg, seed2)
        r0 = pd[0][pidx].astype(jnp.float32)
        acc = ~is_c & (r0[..., 7] == 3.0)
        di_idx, di_ok = rr._pick_first_k_major(acc, cfg.spatial_candidate_count)
        return x + r0[0, 0, 0] * 1e-12 + di_idx[0][0].astype(jnp.float32) * 1e-12
    dt = slope(tg, (sdata, cur_di))
    say(f"tries+S0+firstk (DI):  {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
