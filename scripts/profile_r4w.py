"""Round-4 part W: POST-restructure frame decomposition at 1080p.

r4q2 after the flat-[N] restructure: frame 2722 ms = pass1_di 419 +
pass1_gi 1008 + pass2 188 + pass3 1123.  The restructure recovered only
~150 ms of the predicted ~730 ms pass-3 non-vis pool, pass1_gi did not
move, and the in-frame pass2 tick (188 ms) is 8x its standalone measure
(23.4 ms, r4r).  This script decomposes all three with surgical stubs
(every stub keeps shapes + a data dependence so XLA cannot fold or
hoist the remaining work):

  pass3 (visibility stubbed in ALL rows):
    full / p_hat_di stub / p_hat_gi stub / update_reservoir stub /
    jacobian stub / ALL stubs (= claim loops + gathers + glue floor) /
    tries=5 / k=2 ladder points / claim+gather-only replica.
  pass1_gi single bounce: full / trace stub / NEE-candidate stub / both.
  pass1_di: full / trace stub / NEE stub / both.
  pass2: _pack_last alone; pass2_temporal with REAL chained inputs.

Run alone (single tunneled chip).
"""

import dataclasses
import os
import sys
import time

# comma list of sections to run: pass3,claim,gi,p1,p2 (default all)
PARTS = set(os.environ.get("R4W_PARTS", "pass3,claim,gi,p1,p2").split(","))

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


# ---------------------------------------------------------------- stubs
def stub_vis_batch(scene_, queries, cfg_):
    return [jnp.ones_like(q[0][0]) for q in queries]


def stub_vis_check(scene_, x1, n1, d, dist, cfg_):
    return jnp.ones_like(dist)


def stub_p_hat_di(scene_, x1, n1, x2, n2, l2, outgoing, mat, use_vis, cfg_,
                  vis_mask=None):
    return jnp.abs(x2[0]) + jnp.abs(l2[0]) + 1.0


def stub_p_hat_gi(scene_, x1, n1, xn, e3, outgoing, mat, use_vis, cfg_,
                  vis_mask=None):
    f = jnp.abs(xn[0]) + 1.0
    return (f, f + jnp.abs(e3[0]), f)


def stub_jac(x1_r, x1_q, x2q, n2q):
    return jnp.abs(x2q[0]) + 1.0


def stub_update(r, keys, accept_mask, wi, m_add, sample, seed):
    w_sum = jnp.where(accept_mask, r["w_sum"] + wi, r["w_sum"])
    out = dict(r, w_sum=w_sum, m=r["m"] + m_add)
    for key, vec in zip(keys, sample):
        out[key] = pv.where(accept_mask, vec, r[key])
    return out, accept_mask, seed


def stub_trace(scene_, origins, dirs, cfg_, t_min=1e-4, coherent=True):
    o = restir.as_planes3(origins)
    d = restir.as_planes3(dirs)
    pos = pv.add(o, d)
    valid = d[0] > -2.0
    return dict(pos=pos, normal=pv.neg(d),
                area=jnp.abs(d[0]) + 1e-3,
                mid=(jnp.abs(o[0]) > -1.0).astype(jnp.int32),
                obj=jnp.zeros_like(o[0], jnp.int32), valid=valid)


def stub_nee(scene_, x1, normal, outgoing, mat, seed, i):
    f = jnp.abs(x1[0]) * 1e-6 + 0.5
    v = (f, f, f)
    return dict(p_hat=f, pdf_light=f, pdf_bsdf=f, x2=v, n2=v, emission=v,
                l_norm=v, dist=f + 1.0)


class patched:
    """Temporarily swap module attributes: patched((mod, name, fn), ...)"""

    def __init__(self, *swaps):
        self.swaps = swaps

    def __enter__(self):
        self.saved = [(m, n, getattr(m, n)) for m, n, _ in self.swaps]
        for m, n, f in self.swaps:
            setattr(m, n, f)

    def __exit__(self, *exc):
        for m, n, f in self.saved:
            setattr(m, n, f)


def main():
    say("device:", jax.devices()[0])
    scene, camera = build_scene("reference")
    W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1920, 1080)
    cfg = RenderConfig(width=W, height=H)
    r = rr.RestirRenderer(scene, camera, cfg)
    sa = r.scene_arrays
    say(f"{W}x{H} N={cfg.num_pixels} k={cfg.spatial_candidate_count} "
        f"tries={cfg.spatial_max_tries} nee={cfg.nee_samples} "
        f"gi_bounces={cfg.gi_bounces}")

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

    # ---------------- pass3 ablations (visibility stubbed everywhere)
    def run_pass3(x, rdi, rgi, sd0, cfg_):
        sd = dict(sd0)
        sd["x1"] = tuple(c + x * 1e-20 for c in sd["x1"])
        rad, shading, out_di, out_gi = rr.pass3_spatial.__wrapped__(
            sa, cam, frame, dict(rdi), dict(rgi), sd, cfg_)
        return x + rad[0, 0] * 1e-9 + out_di["w"][0] * 1e-9 \
            + out_gi["w"][0] * 1e-9

    vis_stubs = [(restir, "visibility_batch_p", stub_vis_batch),
                 (restir, "visibility_check_p", stub_vis_check)]
    rows = [
        ("novis FULL", []),
        ("novis p_hat_di stub", [(restir, "get_p_hat_di_p", stub_p_hat_di)]),
        ("novis p_hat_gi stub", [(restir, "get_p_hat_gi_p", stub_p_hat_gi)]),
        ("novis update stub", [(rr, "update_reservoir_p", stub_update)]),
        ("novis jacobian stub", [(restir, "jacobian_reconnection_p",
                                  stub_jac)]),
        ("novis ALL stubs", [(restir, "get_p_hat_di_p", stub_p_hat_di),
                             (restir, "get_p_hat_gi_p", stub_p_hat_gi),
                             (rr, "update_reservoir_p", stub_update),
                             (restir, "jacobian_reconnection_p", stub_jac)]),
    ]
    for label, swaps in (rows if "pass3" in PARTS else []):
        with patched(*(vis_stubs + swaps)):
            dt = slope(lambda x, a, b, c: run_pass3(x, a, b, c, cfg),
                       (res_di, res_gi, sdata))
        say(f"  pass3 {label:24s}: {dt*1e3:8.1f} ms")
    for label, cfg_v in ([
        ("novis tries=5", dataclasses.replace(cfg, spatial_max_tries=5)),
        ("novis k=2", dataclasses.replace(cfg, spatial_candidate_count=2)),
    ] if "pass3" in PARTS else []):
        with patched(*vis_stubs):
            dt = slope(lambda x, a, b, c: run_pass3(x, a, b, c, cfg_v),
                       (res_di, res_gi, sdata))
        say(f"  pass3 {label:24s}: {dt*1e3:8.1f} ms")

    # claim-loop + payload-gather replica (DI table): in-situ anchor for
    # the streamed try pipeline alone
    xs, ys = rr._pixel_grid(cfg)
    rd = rr._rec_dtype(cfg)
    k = cfg.spatial_candidate_count

    def claim_only(x, rdi, sd0):
        sd = dict(sd0)
        sd["x1"] = tuple(c + x * 1e-20 for c in sd["x1"])
        packed = rr._pack_record(sd, dict(rdi), rr._DI_KEYS, rd)
        seed2 = rr.pixel_seed(xs, ys, 3, frame)
        cnt = jnp.zeros(xs.shape, jnp.int32)
        sel = None
        oks = [jnp.zeros(xs.shape, bool) for _ in range(k)]
        for t in range(cfg.spatial_max_tries):
            pidx_t, is_c = rr._spatial_try_at(xs, ys, cfg, seed2, t)
            r0 = packed[0][pidx_t].astype(jnp.float32)
            c_mid = r0[:, 6].astype(jnp.int32)
            acc = (~is_c & (r0[:, 7] == 3.0)
                   & ~rr._sentinel(c_mid) & (c_mid == sd["mid"]))
            if sel is None:
                sel = [pidx_t] * k
            for v in range(k):
                take = acc & (cnt == v)
                sel[v] = jnp.where(take, pidx_t, sel[v])
                oks[v] = oks[v] | take
            cnt = cnt + acc.astype(jnp.int32)
        out = x
        for v in range(k):
            r0v = packed[0][sel[v]].astype(jnp.float32)
            r2v = packed[2][sel[v]].astype(jnp.float32)
            out = out + jnp.sum(r0v[:, 0] + r2v[:, 1]) * 1e-12
        return out
    if "claim" in PARTS:
        dt = slope(claim_only, (res_di, sdata))
        say(f"  pass3 claim+gather DI replica : {dt*1e3:8.1f} ms")

    # ---------------- pass1_gi single-bounce ablations
    def run_bounce(x, st_in):
        s2 = dict(st_in)
        s2["origin"] = tuple(c + x * 1e-20 for c in s2["origin"])
        out = restir_gi.gi_bounce(sa, cfg, s2, jnp.uint32(1))
        return x + out["acc_l"][0][0] * 1e-9 + out["xn"][0][0] * 1e-9

    gi_rows = [
        ("bounce FULL", []),
        ("bounce trace stub", [(restir, "trace_closest_p", stub_trace)]),
        ("bounce NEE stub", [(restir, "nee_candidate_at_p", stub_nee)]),
        ("bounce trace+NEE stub", [(restir, "trace_closest_p", stub_trace),
                                   (restir, "nee_candidate_at_p",
                                    stub_nee)]),
        ("bounce update stub", [(restir_gi, "update_reservoir_p",
                                 stub_update)]),
    ]
    for label, swaps in (gi_rows if "gi" in PARTS else []):
        with patched(*swaps):
            dt = slope(run_bounce, (st0,))
        say(f"  pass1_gi {label:22s}: {dt*1e3:8.1f} ms")

    # ---------------- pass1_di ablations
    def run_p1(x):
        cam2 = dict(cam)
        cam2["view_inv"] = cam["view_inv"] + x * 1e-20
        rdi, sd, gii, s = rr.pass1_di.__wrapped__(sa, cam2, frame, cfg)
        return x + rdi["w"][0] * 1e-9 + sd["x1"][0][0] * 1e-9

    p1_rows = [
        ("FULL", []),
        ("trace stub", [(restir, "trace_closest_p", stub_trace)]),
        ("NEE stub", [(restir, "nee_candidate_at_p", stub_nee)]),
        ("trace+NEE stub", [(restir, "trace_closest_p", stub_trace),
                            (restir, "nee_candidate_at_p", stub_nee)]),
    ]
    for label, swaps in (p1_rows if "p1" in PARTS else []):
        with patched(*(vis_stubs + swaps)):
            dt = slope(run_p1)
        say(f"  pass1_di novis {label:16s}: {dt*1e3:8.1f} ms")

    # ---------------- gather width model (non-hoistable indices, the
    # real pass-3 tap pattern: 9 independent try-gathers per table).
    # Decides the wide-row consolidation: r4t showed [N,8] ~= [N,4] per
    # ROW (latency-bound), so fusing shards into one wide row should cut
    # gather count ~2x if width stays free through 24-32 f32.
    if "width" in PARTS:
        n = cfg.num_pixels
        idx9 = [jnp.asarray(np.random.default_rng(i).integers(
            0, n, n, dtype=np.int32)) for i in range(9)]

        def g_width(x, tab, k_g):
            # index depends on x only through a never-true clamp, so the
            # gather cannot hoist but indices are unchanged
            out = x
            for i in range(k_g):
                ix = jnp.where(x > 1e30, 0, idx9[i])
                out = out + jnp.sum(tab[ix][:, 0]) * 1e-12
            return out

        for w_cols, k_g, label in [(8, 9, "9x [N,8]"), (16, 9, "9x [N,16]"),
                                   (24, 9, "9x [N,24]"), (32, 9, "9x [N,32]"),
                                   (8, 3, "3x [N,8]"), (24, 3, "3x [N,24]"),
                                   (16, 1, "1x [N,16]"), (8, 2, "2x [N,8]")]:
            tab = jnp.asarray(
                np.random.default_rng(0).normal(size=(n, w_cols))
                .astype(np.float32))
            dt = slope(lambda x, t=tab, k_g=k_g: g_width(x, t, k_g))
            say(f"  gather width {label:12s}: {dt*1e3:8.1f} ms "
                f"({dt*1e9/(n*k_g):6.2f} ns/row)")

    # ---------------- pass2 + _pack_last with REAL chained inputs
    if "p2" not in PARTS:
        return
    r2 = rr.RestirRenderer(scene, camera, cfg)
    r2.render()
    r2.render()
    jax.block_until_ready(r2.fb.accum)
    say("renderer chained state ready")

    def run_pack(x):
        ld = jax.tree.map(lambda v: v, r2.last_di)
        ld = dataclasses.replace(ld, w_sum=ld.w_sum + x * 1e-20)
        pd, pg = rr._pack_last(ld, r2.last_gi, r2.last_sdata,
                               rr._rec_dtype(cfg))
        return x + pd[0][0, 0].astype(jnp.float32) * 1e-9 \
            + pg[0][0, 0].astype(jnp.float32) * 1e-9
    dt = slope(run_pack)
    say(f"  _pack_last (3+3 tables)       : {dt*1e3:8.1f} ms")

    pd, pg = rr._pack_last(r2.last_di, r2.last_gi, r2.last_sdata,
                           rr._rec_dtype(cfg))

    from royaltracer_dx_tpu.ops.reservoir import sdata_to_planes

    def run_pass2(x):
        sd = sdata_to_planes(r2.last_sdata)
        sd["x1"] = tuple(c + x * 1e-20 for c in sd["x1"])
        rdi, rgi = rr.pass2_temporal.__wrapped__(
            sa, cam, frame, dict(res_di), dict(res_gi), sd, pd, pg, cfg)
        return x + rdi["w_sum"][0] * 1e-9 + rgi["w_sum"][0] * 1e-9
    dt = slope(run_pass2)
    say(f"  pass2_temporal chained inputs : {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
