"""Round-4 part S: locate the pass-3 tries=6 -> 9 cost cliff.

r4o ladder (novis, k=3): tries=3 -> 377 ms, 6 -> 423, 9 -> 732.  The
+309 ms step from 6 to 9 dwarfs the +46 from 3 to 6 — prime suspect is
TPU sublane padding: [T, N] tensors round T up to the 8-sublane tile,
so T=9 physically occupies 16 sublanes (78% wasted traffic on every
[T, N] intermediate), and the [2T, N] = [18, N] RNG block pads to 24.
This probes: pass3 novis at tries = 7, 8, 9 (k=3), then a standalone
microbench of the tap pipeline (gather + accept chain + first-k pick)
in [T, N] layout vs list-of-[N] planes at T=9.

Run alone (single tunneled chip).
"""

import dataclasses
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


def main():
    say("device:", jax.devices()[0])
    scene, camera = build_scene("reference")
    cfg = RenderConfig(width=1920, height=1080)
    r = rr.RestirRenderer(scene, camera, cfg)
    sa = r.scene_arrays
    n = cfg.num_pixels
    say(f"1920x1080 N={n}")

    cam = r._camera_arrays()
    frame = jnp.uint32(7)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)
    st = rr.pass1_gi_init(sa, gi_in, seed, cfg)
    for b in range(cfg.gi_bounces):
        st = rr.pass1_gi_bounce(sa, cfg, st, jnp.uint32(b))
    res_gi, _ = rr.pass1_gi_final(sa, gi_in, st, cfg)
    jax.block_until_ready(res_di["w_sum"])
    say("pass1 inputs ready")

    real_vb = restir.visibility_batch_p
    real_vc = restir.visibility_check_p
    restir.visibility_batch_p = (
        lambda scene_, queries, cfg_: [jnp.ones_like(q[0][0])
                                       for q in queries])
    restir.visibility_check_p = (
        lambda scene_, x1, n1, d, dist, cfg_: jnp.ones_like(dist))

    def run_pass3(x, rdi, rgi, sd0, cfg_):
        sd = dict(sd0)
        sd["x1"] = tuple(c + x * 1e-20 for c in sd["x1"])
        rad, shading, out_di, out_gi = rr.pass3_spatial.__wrapped__(
            sa, cam, frame, dict(rdi), dict(rgi), sd, cfg_)
        return x + rad[0, 0] * 1e-9 + out_di["w"][0] * 1e-9

    for t in (7, 8, 9):
        cfg_v = dataclasses.replace(cfg, spatial_max_tries=t)
        dt = slope(lambda x, a, b, c: run_pass3(x, a, b, c, cfg_v),
                   (res_di, res_gi, sdata))
        say(f"  pass3 novis k=3 tries={t} : {dt*1e3:8.1f} ms")

    restir.visibility_batch_p = real_vb
    restir.visibility_check_p = real_vc

    # ---- microbench: tap pipeline in [T,N] vs list-of-[N] layouts
    rd = rr._rec_dtype(cfg)
    packed_di = rr._pack_record(sdata, res_di, rr._DI_KEYS, rd)
    xs, ys = rr._pixel_grid(cfg)
    T = 9
    cam_pos = tuple(cam["view_inv"][c, 3] for c in range(3))

    def tap_2d(x, packed_di, sd0):
        sd = dict(sd0)
        x1s = tuple(c + x * 1e-20 for c in sd["x1"])
        seed2 = rr.pixel_seed(xs, ys, 3, frame)
        pidx, is_center, seed2 = rr._spatial_tries(xs, ys, cfg, seed2)
        r0 = packed_di[0][pidx].astype(jnp.float32)        # [T, N, 8]
        c_x1 = (r0[..., 0], r0[..., 1], r0[..., 2])
        c_n1 = (r0[..., 3], r0[..., 4], r0[..., 5])
        c_mid = r0[..., 6].astype(jnp.int32)
        accept = (
            ~is_center
            & ~restir.reject_normal_p(sd["n1"], c_n1, 0.9)
            & ~restir.reject_distance_p(x1s, c_x1, cam_pos, 0.1)
            & (r0[..., 7] == 3.0)
            & (c_mid == sd["mid"])
        )
        di_idx, di_ok = rr._pick_first_k_major(accept, 3)
        acc = x
        for v in range(3):
            acc = acc + jnp.sum(jnp.where(di_ok[v], di_idx[v], 0)
                                .astype(jnp.float32)) * 1e-12
        return acc
    dt = slope(tap_2d, (packed_di, sdata))
    say(f"  tap pipeline [T,N] layout   : {dt*1e3:8.1f} ms")

    def tap_list(x, packed_di, sd0):
        sd = dict(sd0)
        x1s = tuple(c + x * 1e-20 for c in sd["x1"])
        seed2 = rr.pixel_seed(xs, ys, 3, frame)
        pidx, is_center, seed2 = rr._spatial_tries(xs, ys, cfg, seed2)
        cnt = jnp.zeros((n,), jnp.int32)
        idxs = [jnp.zeros((n,), jnp.int32) for _ in range(3)]
        oks = [jnp.zeros((n,), bool) for _ in range(3)]
        for t in range(T):
            r0 = packed_di[0][pidx[t]].astype(jnp.float32)  # [N, 8]
            c_x1 = (r0[:, 0], r0[:, 1], r0[:, 2])
            c_n1 = (r0[:, 3], r0[:, 4], r0[:, 5])
            c_mid = r0[:, 6].astype(jnp.int32)
            acc_t = (
                ~is_center[t]
                & ~restir.reject_normal_p(sd["n1"], c_n1, 0.9)
                & ~restir.reject_distance_p(x1s, c_x1, cam_pos, 0.1)
                & (r0[:, 7] == 3.0)
                & (c_mid == sd["mid"])
            )
            for v in range(3):
                take = acc_t & (cnt == v)
                idxs[v] = jnp.where(take, t, idxs[v])
                oks[v] = oks[v] | take
            cnt = cnt + acc_t.astype(jnp.int32)
        acc = x
        for v in range(3):
            acc = acc + jnp.sum(jnp.where(oks[v], idxs[v], 0)
                                .astype(jnp.float32)) * 1e-12
        return acc
    dt = slope(tap_list, (packed_di, sdata))
    say(f"  tap pipeline list-of-[N]    : {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
