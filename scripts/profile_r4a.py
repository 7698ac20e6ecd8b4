"""Round-4 part A: flagship re-measurement on a healthy tunnel.

1. garage 256^2 frame time (the BENCH_r03 row regressed 127.5 -> 242.7 ms
   vs round 2 with identical channel means — re-measure + per-pass split).
2. garage 1080p frame time + per-pass split (VERDICT r3 #1: goal <= 1.5 s).
3. Mask-occupancy census of every visibility batch + GI bounce at 1080p:
   the fraction of ACTIVE lanes per trace site decides whether lane
   compaction of the fused batches can pay.

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
from royaltracer_dx_tpu.render import restir_renderer as rr
from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer


def say(*a):
    print(*a, flush=True)


def frames(r, n=5):
    r.render()
    jax.block_until_ready(r.fb.accum)
    t0 = time.perf_counter()
    for _ in range(n):
        r.render()
    return (time.perf_counter() - t0) / n


def profile_frame(r):
    r.profile = True
    r.render()
    r.profile = False
    return {k: round(v * 1e3, 1)
            for k, v in r.metrics.get("pass_times_s", {}).items()}


def occupancy_census(r):
    """Fractions of active lanes at every masked trace site (one frame,
    pieces re-run un-jitted where needed)."""
    cfg = r.cfg
    sa = r.scene_arrays
    cam = r._camera_arrays()
    frame = jnp.uint32(max(r.frame, 1))
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)
    out = {}
    s1 = float(jnp.mean(gi_in["sampling"].astype(jnp.float32)))
    out["pass1_sampling"] = s1
    out["pass1_W_vis"] = float(jnp.mean(
        (gi_in["sampling"] & (res_di["w_sum"] > 0.0)).astype(jnp.float32)))
    st = rr.pass1_gi_init(sa, gi_in, seed, cfg)
    st["active"] = st["active"] & gi_in["sampling"]
    for b in range(cfg.gi_bounces):
        out[f"gi_bounce{b}_active"] = float(
            jnp.mean(st["active"].astype(jnp.float32)))
        st = rr.pass1_gi_bounce(sa, cfg, st, jnp.uint32(b))

    packed_di, packed_gi = rr._pack_last(
        r.last_di, r.last_gi, r.last_sdata, jnp.float32)

    # ---- pass 2 accepts (re-derive exactly as pass2_temporal does)
    from royaltracer_dx_tpu.ops import restir
    from royaltracer_dx_tpu.ops.reservoir import is_valid_gi_p
    from royaltracer_dx_tpu.utils import pvec as pv

    xs, ys = rr._pixel_grid(cfg)
    cam_pos = tuple(cam["view_inv"][c, 3] for c in range(3))
    shading = ~((sdata["l1"][0] != 0.0) | (sdata["l1"][1] != 0.0)
                | (sdata["l1"][2] != 0.0))
    px, py = restir.reproject_to_prev_pixel_p(
        sa, sdata["x1"], sdata["obj"], cam["prev_view"], cam["prev_proj"],
        cfg.width, cfg.height)
    in_bounds = ((px >= 0) & (px < cfg.width) & (py >= 0) & (py < cfg.height))
    idx = jnp.clip(py, 0, cfg.height - 1) * cfg.width + jnp.clip(
        px, 0, cfg.width - 1)
    l_sd, l_di = rr._unpack_record(tuple(s[idx] for s in packed_di),
                                   rr._DI_KEYS)
    l_gi = rr._unpack_res(packed_gi[1][idx], packed_gi[2][idx], rr._GI_KEYS)
    accept_di = (shading & in_bounds & l_sd["l1_zero"] & l_di["valid"]
                 & ~restir.reject_distance_p(sdata["x1"], l_sd["x1"],
                                             cam_pos, 0.1)
                 & (l_di["x2"][0] != 0.0) & (l_di["x2"][1] != 0.0)
                 & (l_di["x2"][2] != 0.0)
                 & (l_sd["mid"] == sdata["mid"]))
    accept_gi = (shading & in_bounds & l_sd["l1_zero"]
                 & ~restir.reject_w_sum(l_gi["w_sum"], cfg.w_sum_threshold)
                 & ~restir.reject_distance_p(sdata["x1"], l_sd["x1"],
                                             cam_pos, 0.1)
                 & is_valid_gi_p(l_gi)
                 & (l_sd["mid"] == sdata["mid"]))
    out["pass2_accept_di"] = float(jnp.mean(accept_di.astype(jnp.float32)))
    out["pass2_accept_gi"] = float(jnp.mean(accept_gi.astype(jnp.float32)))
    out["shading"] = float(jnp.mean(shading.astype(jnp.float32)))

    # ---- pass 3 candidate picks (un-jitted internals over pass-1
    # reservoirs; the pick distribution matches the real pass closely)
    seed3 = rr.pixel_seed(xs, ys, 3, frame)
    mat = restir.fetch_material_p(sa, sdata["mid"])
    k = cfg.spatial_candidate_count
    rd = rr._rec_dtype(cfg)
    res_gi, _ = rr.pass1_gi_final(sa, gi_in, st, cfg)
    packed_di3 = rr._pack_record(sdata, res_di, rr._DI_KEYS, rd)
    packed_gi3 = rr._pack_record(sdata, res_gi, rr._GI_KEYS, rd)
    pidx, is_center, seed3 = rr._spatial_tries(xs, ys, cfg, seed3)
    r0 = packed_di3[0][pidx].astype(jnp.float32)
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
    for v in range(k):
        out[f"pass3_di_ok{v}"] = float(jnp.mean(
            (shading & di_ok[v]).astype(jnp.float32)))
    _gp = rr._gi_candidates(sa, res_gi, sdata, mat, packed_gi3, cam_pos,
                            xs, ys, cfg, seed3, 0, cfg.height)
    _, _, gi_ok, nb_gi, _, _ = _gp
    for v in range(k):
        out[f"pass3_gi_ok{v}"] = float(jnp.mean(
            (shading & gi_ok[v]).astype(jnp.float32)))
    return out


def main():
    say("device:", jax.devices()[0])
    scene, camera = build_scene("reference")

    say("\n=== garage 256^2 (regression re-measurement) ===")
    r = RestirRenderer(scene, camera, RenderConfig(width=256, height=256))
    t0 = time.perf_counter()
    r.render()
    say(f"first frame (compile): {time.perf_counter()-t0:.1f}s")
    dt = frames(r, 5)
    say(f"frame: {dt*1e3:.1f} ms  fps {1/dt:.2f}")
    say("pass profile:", profile_frame(r))
    img = r.radiance()
    say("channel means:", [round(float(c), 4) for c in img.mean(axis=(0, 1))])

    if "--skip1080" not in sys.argv:
        say("\n=== garage 1080p ===")
        scene2, cam2 = build_scene("reference")
        r2 = RestirRenderer(scene2, cam2, RenderConfig(width=1920, height=1080))
        t0 = time.perf_counter()
        r2.render()
        say(f"first frame (compile): {time.perf_counter()-t0:.1f}s")
        dt2 = frames(r2, 3)
        say(f"frame: {dt2:.3f} s  fps {1/dt2:.2f}")
        say("pass profile:", profile_frame(r2))

        say("\n=== occupancy census (1080p) ===")
        cen = occupancy_census(r2)
        for kk, vv in cen.items():
            say(f"  {kk:24s} {vv:.3f}")


if __name__ == "__main__":
    main()
