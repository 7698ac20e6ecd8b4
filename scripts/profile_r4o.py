"""Round-4 part O: pass-3 cost ladder by CONFIG scaling at 1080p.

r3n/r4j stub ablations say pass3's ~730 ms of non-vis work is neither
p_hat flops (stub = wash), nor gathers (2.4 ms), nor record packing
(~0) — so it must scale with the structural knobs: the k merge chains
and the T try-machinery (accept logic, first-k pick, per-try layout).
This ladder times pass3 at (k, tries) combinations with visibility
STUBBED (so the trace doesn't drown the signal), giving d(cost)/dk and
d(cost)/dT directly, plus the k=0 fixed floor.  Also times
_pick_first_k_major and _spatial_tries standalone.

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
    W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1920, 1080)
    cfg = RenderConfig(width=W, height=H)
    r = rr.RestirRenderer(scene, camera, cfg)
    sa = r.scene_arrays
    n = cfg.num_pixels
    say(f"{W}x{H} N={n} default k={cfg.spatial_candidate_count} "
        f"tries={cfg.spatial_max_tries}")

    cam = r._camera_arrays()
    frame = jnp.uint32(7)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)
    st = rr.pass1_gi_init(sa, gi_in, seed, cfg)
    for b in range(cfg.gi_bounces):
        st = rr.pass1_gi_bounce(sa, cfg, st, jnp.uint32(b))
    res_gi, _ = rr.pass1_gi_final(sa, gi_in, st, cfg)
    jax.block_until_ready(res_di["w_sum"])
    say("pass1 inputs ready")

    # visibility stubbed for ALL ladder rows (the trace is measured
    # elsewhere; here we want the resampling machinery alone)
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

    ladder = [(0, 9), (1, 9), (2, 9), (3, 9), (3, 6), (3, 3)]
    for k, t in ladder:
        cfg_v = dataclasses.replace(
            cfg, spatial_candidate_count=k, spatial_max_tries=t)
        dt = slope(lambda x, a, b, c: run_pass3(x, a, b, c, cfg_v),
                   (res_di, res_gi, sdata))
        say(f"  pass3 novis k={k} tries={t} : {dt*1e3:8.1f} ms")

    restir.visibility_batch_p = real_vb
    restir.visibility_check_p = real_vc

    # standalone: the try/pick machinery per table
    xs, ys = rr._pixel_grid(cfg)

    def tries_only(x, sd0):
        sd = dict(sd0)
        x1 = tuple(c + x * 1e-20 for c in sd["x1"])
        seed2 = rr.pixel_seed(xs, ys, 3, frame)
        pidx, is_center, seed2 = rr._spatial_tries(xs, ys, cfg, seed2)
        return x + jnp.sum(pidx[:, :4].astype(jnp.float32)) * 1e-12 \
            + x1[0][0] * 1e-20
    dt = slope(tries_only, (sdata,))
    say(f"  _spatial_tries alone        : {dt*1e3:8.1f} ms")

    rd = rr._rec_dtype(cfg)
    packed_di = rr._pack_record(sdata, res_di, rr._DI_KEYS, rd)

    def pick_only(x, packed_di, sd0):
        seed2 = rr.pixel_seed(xs, ys, 3, frame)
        pidx, is_center, seed2 = rr._spatial_tries(xs, ys, cfg, seed2)
        r0 = (packed_di[0][pidx] + x * 1e-20).astype(jnp.float32)
        accept = (~is_center) & (r0[..., 7] == 3.0)
        di_idx, di_ok = rr._pick_first_k_major(
            accept, cfg.spatial_candidate_count)
        acc = x
        for v in range(cfg.spatial_candidate_count):
            acc = acc + jnp.sum(di_idx[v][:8].astype(jnp.float32)) * 1e-12
        return acc
    dt = slope(pick_only, (packed_di, sdata))
    say(f"  tries+S0+pick (DI)          : {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
