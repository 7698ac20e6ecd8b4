"""Round-4 part F: (1) duplicate-segment census for the pass-2/3
visibility queries, (2) per-site closest-trace cost decomposition.

Motivation (r4e): the 1080p flagship frame is trace-bound, and pass-1's
closest sites run at 80-91 ns/lane vs the 27-38 ns the standalone trace
costs — where is the difference?  And pass 3's 9N visibility queries are
V(x1_a -> x2_b) segments whose endpoints ReSTIR reuse makes IDENTICAL
across pixels after convergence: if x2_nbr == x2_self bitwise, the
canonical-MIS segment V(x1_nbr -> x2_self) equals the neighbor's own
already-traced V(x1_nbr -> x2_nbr), so the lane can be retired EXACTLY.
This script measures how often that happens on the warm garage.

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


def veq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1]) & (a[2] == b[2])


def frac(mask, where=None):
    if where is None:
        return float(jnp.mean(mask.astype(jnp.float32)))
    w = where.astype(jnp.float32)
    return float(jnp.sum(mask.astype(jnp.float32) * w)
                 / jnp.maximum(jnp.sum(w), 1.0))


def dup_census(tag, W, H, frames):
    scene, camera = build_scene("reference")
    cfg = RenderConfig(width=W, height=H)
    r = rr.RestirRenderer(scene, camera, cfg)
    for _ in range(frames):
        r.render()
    jax.block_until_ready(r.fb.accum)
    say(f"\n=== dup census {tag} ({W}x{H}, frame {r.frame}) ===")

    sa = r.scene_arrays
    cam = r._camera_arrays()
    frame = jnp.uint32(r.frame)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)
    st = rr.pass1_gi_init(sa, gi_in, seed, cfg)
    for b in range(cfg.gi_bounces):
        st = rr.pass1_gi_bounce(sa, cfg, st, jnp.uint32(b))
    res_gi, _ = rr.pass1_gi_final(sa, gi_in, st, cfg)
    p1_di_x2 = res_di["x2"]

    packed_di_l, packed_gi_l = rr._pack_last(
        r.last_di, r.last_gi, r.last_sdata, jnp.float32)
    cur_di, cur_gi = rr.pass2_temporal(
        sa, cam, frame, res_di, res_gi, sdata, packed_di_l, packed_gi_l, cfg)

    # --- pass-2 dup: the temporal vis segment (x1, x2_prev) vs pass-1's
    # already-traced (x1, x2_p1)
    idx_l = None
    xs, ys = rr._pixel_grid(cfg)
    shading = ~((sdata["l1"][0] != 0.0) | (sdata["l1"][1] != 0.0)
                | (sdata["l1"][2] != 0.0))
    px, py = restir.reproject_to_prev_pixel_p(
        sa, sdata["x1"], sdata["obj"], cam["prev_view"], cam["prev_proj"],
        cfg.width, cfg.height)
    in_b = (px >= 0) & (px < cfg.width) & (py >= 0) & (py < cfg.height)
    idx_l = (jnp.clip(py, 0, cfg.height - 1) * cfg.width
             + jnp.clip(px, 0, cfg.width - 1))
    l_sd, l_di = rr._unpack_record(
        tuple(s[idx_l] for s in packed_di_l), rr._DI_KEYS)
    l_gi = rr._unpack_res(packed_gi_l[1][idx_l], packed_gi_l[2][idx_l],
                          rr._GI_KEYS)
    say(f"pass2 DI  dup (x2_prev==x2_p1, among in-bounds shading): "
        f"{frac(veq(l_di['x2'], p1_di_x2), shading & in_b):.3f}")
    say(f"pass2 GI  dup (xn_prev==xn_p1):                          "
        f"{frac(veq(l_gi['xn'], res_gi['xn']), shading & in_b):.3f}")

    # --- pass-3 census: replicate the candidate picks
    seed3 = rr.pixel_seed(xs, ys, 3, frame)
    cam_pos = tuple(cam["view_inv"][c, 3] for c in range(3))
    mat = restir.fetch_material_p(sa, sdata["mid"])
    k = cfg.spatial_candidate_count
    packed_di = rr._pack_record(sdata, cur_di, rr._DI_KEYS, jnp.float32)
    packed_gi = rr._pack_record(sdata, cur_gi, rr._GI_KEYS, jnp.float32)
    pidx, is_center, seed3 = rr._spatial_tries(xs, ys, cfg, seed3, 0, None)
    r0 = packed_di[0][pidx]
    c_x1 = (r0[..., 0], r0[..., 1], r0[..., 2])
    c_n1 = (r0[..., 3], r0[..., 4], r0[..., 5])
    c_mid = r0[..., 6].astype(jnp.int32)
    accept = (~is_center
              & ~restir.reject_normal_p(sdata["n1"], c_n1, 0.9)
              & ~restir.reject_distance_p(sdata["x1"], c_x1, cam_pos, 0.1)
              & (r0[..., 7] == 3.0)
              & ~rr._sentinel(c_mid)
              & (c_mid == sdata["mid"]))
    di_idx, di_ok = rr._pick_first_k_major(accept, k)
    tot_ok, tot_dup = 0.0, 0.0
    for v in range(k):
        sel_pidx = jnp.take_along_axis(pidx, di_idx[v][None, :], 0)[0]
        nb = rr._unpack_res(packed_di[1][sel_pidx],
                            packed_di[2][sel_pidx], rr._DI_KEYS)
        ok = shading & di_ok[v]
        dup = veq(nb["x2"], cur_di["x2"])
        say(f"pass3 DI v{v}: ok={frac(ok):.3f}  "
            f"dup(x2_nbr==x2_self | ok)={frac(dup, ok):.3f}")
        tot_ok += frac(ok)
        tot_dup += frac(dup & ok)
    gi_pick = rr._gi_candidates(sa, cur_gi, sdata, mat, packed_gi, cam_pos,
                                xs, ys, cfg, seed3, 0, None)
    pidx_g, gi_idx, gi_ok, nb_gi, nb_sd_g, seed3 = gi_pick
    for v in range(k):
        ok = shading & gi_ok[v]
        dup = veq(nb_gi[v]["xn"], cur_gi["xn"])
        say(f"pass3 GI v{v}: ok={frac(ok):.3f}  "
            f"dup(xn_nbr==xn_self | ok)={frac(dup, ok):.3f}")
        tot_ok += 2 * frac(ok)            # from_g + fs both keyed on it
        tot_dup += 2 * frac(dup & ok)
    say(f"pass3 vis lanes: {9:.0f}/pixel nominal, live {3 * tot_ok / 3:.2f}, "
        f"retireable {tot_dup:.2f}")

    # --- final-shade vis dup: how often does the canonical sample win
    # pass 3 (out.x2 == cur.x2)?
    sample, shaded, out_di, out_gi = rr.pass3_spatial(
        sa, cam, frame, cur_di, cur_gi, sdata, cfg)
    say(f"pass3 final dup (out_di.x2==cur_di.x2 | shading): "
        f"{frac(veq(out_di['x2'], cur_di['x2']), shading):.3f}")
    say(f"pass1 reservoir nonzero (W vis traced): "
        f"{frac(res_di['w_sum'] > 0.0, shading):.3f}")
    return r


def site_decomposition(W=1920, H=1080):
    """Where do the pass-1 closest sites' 80-91 ns/lane go?"""
    scene, camera = build_scene("reference")
    cfg = RenderConfig(width=W, height=H)
    r = rr.RestirRenderer(scene, camera, cfg)
    sa = r.scene_arrays
    n = cfg.num_pixels
    say(f"\n=== closest-site decomposition ({n} rays, garage) ===")

    key = jax.random.PRNGKey(0)
    o_np = jax.random.uniform(key, (3, n), minval=-1.0, maxval=1.0)
    d_np = jax.random.normal(jax.random.PRNGKey(1), (3, n))
    d_np = d_np / jnp.linalg.norm(d_np, axis=0, keepdims=True)
    o = tuple(o_np[c] * jnp.float32(1.5) for c in range(3))
    d = tuple(d_np[c] for c in range(3))

    from royaltracer_dx_tpu.ops.stream_trace import (
        any_hit_stream_xla, closest_hit_stream_xla)

    def t_raw(x):
        hit = closest_hit_stream_xla(
            tuple(c + x * 1e-20 for c in o), d, sa.stream,
            t_min=jnp.zeros((n,)) + 1e-4, t_max=jnp.full((n,), 1e30),
            wb=cfg.stream_wb, presort=False)
        return x + jnp.sum(hit.t[:8]) * 1e-12
    dt = slope(t_raw)
    say(f"flat closest RAW (scattered):      {dt*1e3:8.1f} ms "
        f"({dt/n*1e9:5.1f} ns/ray)")

    def t_full(x):
        hitd = restir.trace_closest_p(
            sa, tuple(c + x * 1e-20 for c in o), d, cfg, coherent=False)
        return x + jnp.sum(hitd["pos"][0][:8]) * 1e-12
    dt2 = slope(t_full)
    say(f"trace_closest_p FULL (scattered):  {dt2*1e3:8.1f} ms "
        f"({dt2/n*1e9:5.1f} ns/ray)  epilogue = {(dt2-dt)/n*1e9:.1f} ns/ray")

    # the attributes epilogue alone
    from royaltracer_dx_tpu.ops.intersect import hit_attributes_p
    hit0 = closest_hit_stream_xla(
        o, d, sa.stream, t_min=jnp.zeros((n,)) + 1e-4,
        t_max=jnp.full((n,), 1e30), wb=cfg.stream_wb, presort=False)
    jax.block_until_ready(hit0.t)

    def t_attr(x):
        normal, _, area, mid, obj = hit_attributes_p(
            hit0.replace(t=hit0.t + x * 1e-20), sa.tri_table)
        return x + jnp.sum(normal[0][:8]) * 1e-12
    dt3 = slope(t_attr)
    say(f"hit_attributes_p alone:            {dt3*1e3:8.1f} ms "
        f"({dt3/n*1e9:5.1f} ns/ray)")

    def t_any(x):
        occ = any_hit_stream_xla(
            tuple(c + x * 1e-20 for c in o), d, sa.stream,
            jnp.zeros((n,)), jnp.full((n,), 2.0),
            wb=cfg.stream_wb, presort=False, reverse=False)
        return x + jnp.sum(occ[:8].astype(jnp.float32)) * 1e-12
    dt4 = slope(t_any)
    say(f"flat any-hit RAW (scattered, t<2): {dt4*1e3:8.1f} ms "
        f"({dt4/n*1e9:5.1f} ns/ray)")


def main():
    say("device:", jax.devices()[0])
    dup_census("garage-warm", 256, 256, frames=24)
    dup_census("garage-cold", 256, 256, frames=2)
    site_decomposition()


if __name__ == "__main__":
    main()
