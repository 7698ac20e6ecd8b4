"""Round-3 part L: gi_bounce + pass1 internals at 1080p (slope-timed
small graphs, args passed as jit arguments — never closure constants).
Run alone (single tunneled chip)."""

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
from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer
from royaltracer_dx_tpu.ops import bsdf, restir, restir_gi
from royaltracer_dx_tpu.ops.reservoir import update_reservoir_p
from royaltracer_dx_tpu.utils import pvec as pv


def say(*a):
    print(*a, flush=True)


def slope(step, init, args=(), reps=(2, 6)):
    times = {}
    for k in reps:
        @jax.jit
        def loop(c, a):
            return jax.lax.fori_loop(0, k, lambda i, c: step(c, *a), c)
        r = loop(init, args)
        np.asarray(jax.tree.leaves(r)[0].ravel()[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(init, args)
            np.asarray(jax.tree.leaves(r)[0].ravel()[0])
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
    r = RestirRenderer(scene, camera, cfg)
    sa = r.scene_arrays
    n = cfg.num_pixels
    say(f"{W}x{H} N={n} lights={int(sa.lights.count)} accel={cfg.accel}")

    r.render()
    jax.block_until_ready(r.fb.accum)
    cam = r._camera_arrays()
    frame = jnp.uint32(r.frame)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)
    st0 = rr.pass1_gi_init(sa, gi_in, seed, cfg)
    st0 = jax.block_until_ready(st0)
    mat = restir.fetch_material_p(sa, st0["mid"])

    # ---- full gi_bounce
    def gb(x, st):
        st = dict(st)
        st["acc_pdf"] = st["acc_pdf"] + x * 0.0
        out = restir_gi.gi_bounce(sa, cfg, st, jnp.uint32(1))
        return x + out["acc_pdf"][0] * 1e-12
    try:
        dt = slope(gb, jnp.float32(0.0), (st0,))
        say(f"gi_bounce full:        {dt*1e3:8.1f} ms")
    except Exception as e:
        say(f"gi_bounce full failed: {type(e).__name__}")

    # ---- nee_candidates_p (M=4)
    def nc(x, st, m):
        c, _ = restir.nee_candidates_p(
            sa, st["origin"], st["normal"], st["outgoing"], m,
            st["seed"] + jnp.uint32(x * 0.0), cfg.nee_samples)
        return x + c["p_hat"][0, 0] * 1e-12
    dt = slope(nc, jnp.float32(0.0), (st0, mat))
    say(f"nee_candidates M=4:    {dt*1e3:8.1f} ms")

    # ---- eval + pdf blend at [4, N]
    us = jax.random.uniform(jax.random.PRNGKey(0), (4, n, 3))
    ln = tuple(us[..., c] * 2.0 - 1.0 for c in range(3))
    ln = pv.normalize(ln)

    def eb(x, st, m, ln):
        lnn = (ln[0] + x * 0.0, ln[1], ln[2])
        b = bsdf.eval_bsdf_blend_p(m["kd"], m["ks"], m["metal"], m["rough"],
                                   m["lut"], st["normal"], lnn,
                                   st["outgoing"])
        p = bsdf.pdf_bsdf_blend_p(m["ks"], m["metal"], m["rough"],
                                  st["normal"], lnn, st["outgoing"])
        return x + (b[0][0, 0] + p[0, 0]) * 1e-12
    dt = slope(eb, jnp.float32(0.0), (st0, mat, ln))
    say(f"eval+pdf blend [4,N]:  {dt*1e3:8.1f} ms")

    # ---- select_strategy + sample_bsdf
    def ss(x, st, m):
        strat, _, s = bsdf.select_strategy_p(
            m["ks"], m["metal"], m["rough"], st["normal"], st["outgoing"],
            st["seed"] + jnp.uint32(x * 0.0))
        smp, s = bsdf.sample_bsdf_p(strat, m["ks"], m["rough"],
                                    st["outgoing"], st["normal"], s)
        return x + smp[0][0] * 1e-12
    dt = slope(ss, jnp.float32(0.0), (st0, mat))
    say(f"select+sample bsdf:    {dt*1e3:8.1f} ms")

    # ---- 5x reservoir updates (GI keys)
    def ur(x, st):
        res = dict(st["reservoir"])
        res["w_sum"] = res["w_sum"] + x * 0.0
        s = st["seed"]
        zero = res["w_sum"] * 0.0
        for j in range(5):
            res, took, s = update_reservoir_p(
                res, restir_gi._GI_KEYS, st["active"], res["w_sum"] * 0.1,
                zero, (st["xn"], st["nn"], st["xn"]), s)
        return x + res["w_sum"][0] * 1e-12
    dt = slope(ur, jnp.float32(0.0), (st0,))
    say(f"5x reservoir update:   {dt*1e3:8.1f} ms")

    # ---- trace + attributes (the gi continuation's full hit pipeline)
    def tr(x, st):
        hit = restir.trace_closest_p(
            sa, pv.to_aos(st["origin"]) + x * 0.0,
            pv.to_aos(pv.normalize(st["outgoing"])), cfg, t_min=1e-3)
        return x + hit["pos"][0][0] * 1e-12
    dt = slope(tr, jnp.float32(0.0), (st0,))
    say(f"trace_closest_p+attrs: {dt*1e3:8.1f} ms")

    # ---- attribute fetch alone (tri_table [T,20] small-table gather)
    tri = jnp.abs(jax.random.randint(jax.random.PRNGKey(1), (n,), 0,
                                     int(sa.tri_verts.shape[0])))
    from royaltracer_dx_tpu.ops.intersect import Hit, hit_attributes_p

    def at(x, tri):
        h = Hit(t=jnp.ones((n,)), tri=(tri + jnp.int32(x * 0.0)) % 2221,
                u=jnp.zeros((n,)), v=jnp.zeros((n,)))
        nrm, _, area, mid, obj = hit_attributes_p(h, sa.tri_table)
        return x + nrm[0][0] * 1e-12
    dt = slope(at, jnp.float32(0.0), (tri,))
    say(f"hit_attributes gather: {dt*1e3:8.1f} ms")

    # ---- material fetch at [4, N]
    def mf(x, st):
        mid4 = jnp.broadcast_to(st["mid"][None, :], (4, n))
        m = restir.fetch_material_p(sa, mid4 + jnp.int32(x * 0.0))
        return x + m["rough"][0, 0] * 1e-12
    dt = slope(mf, jnp.float32(0.0), (st0,))
    say(f"fetch_material [4,N]:  {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
