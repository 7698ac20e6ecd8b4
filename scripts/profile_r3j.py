"""Round-3 part J: unit costs inside pass3's non-trace 1.6s at 1080p.

Slope-timed small graphs (safe for the remote-compile upload cap):
  g26   packed[pidx] [9,N] tries x 26-col f32 rows   (the DI gather)
  g26x2 both DI+GI try gathers                       (18 rows/pixel)
  g8    8-col f32 accept-key gather [9,N]
  g26h  f16 26-col gather [9,N]
  sel   _select_try of k=3 from [9,N] 26-plane pytree (where-chains)
  acc   the DI accept chain on gathered planes
  upd   3x update_reservoir_p
  ph    7x get_p_hat_di_p
  tea   tea_batch_major seed streams (2*9 lanes)
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
from royaltracer_dx_tpu.ops import restir
from royaltracer_dx_tpu.utils import pvec as pv
from royaltracer_dx_tpu.utils.rng import pixel_seed, tea_batch_major


def say(*a):
    print(*a, flush=True)


def slope(step, init, args=(), reps=(2, 6)):
    """step(carry, *args) -> carry.  ``args`` are passed as jit ARGUMENTS
    (device buffers), never closure constants — closed-over arrays get
    baked into the compile request, and a 215 MB constant blows the
    remote compile service's upload cap (HTTP 413)."""
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
    say(f"{W}x{H}  N={n}")

    r.render()
    jax.block_until_ready(r.fb.accum)
    cam = r._camera_arrays()
    frame = jnp.uint32(r.frame)
    res_di, sdata, gi_in, seed0 = rr.pass1_di(sa, cam, frame, cfg)
    packed_di = rr._pack_record(sdata, res_di, rr._DI_KEYS, jnp.float32)
    packed_di = jax.block_until_ready(packed_di)
    packed_h = packed_di.astype(jnp.float16)
    packed_8 = packed_di[:, :8].copy()
    xs, ys = rr._pixel_grid(cfg)
    T = cfg.spatial_max_tries

    seed = pixel_seed(xs, ys, 3, frame)
    pidx, is_center, _ = rr._spatial_tries(xs, ys, cfg, seed, 0, None)
    pidx = jax.block_until_ready(pidx)

    # ---- gathers
    def g26(x, tbl, pi):
        rows = tbl[(pi + jnp.int32(x * 0.0)) % n]   # [9, N, 26]
        return x + rows[0, 0, 0].astype(jnp.float32) * 1e-12
    dt = slope(g26, jnp.float32(0.0), (packed_di, pidx))
    say(f"g26  [9,N]x104B gather: {dt*1e3:8.1f} ms "
        f"({dt/(T*n)*1e9:5.2f} ns/row)")

    def g26x2(x, tbl, pi):
        r1 = tbl[(pi + jnp.int32(x * 0.0)) % n]
        r2 = tbl[(pi[::-1] + jnp.int32(x * 0.0)) % n]
        return (x + r1[0, 0, 0] * 1e-12 + r2[0, 0, 0] * 1e-12)
    dt = slope(g26x2, jnp.float32(0.0), (packed_di, pidx))
    say(f"g26x2 18 rows/pixel:    {dt*1e3:8.1f} ms "
        f"({dt/(2*T*n)*1e9:5.2f} ns/row)")

    dt = slope(g26, jnp.float32(0.0), (packed_8, pidx))
    say(f"g8   [9,N]x32B gather:  {dt*1e3:8.1f} ms "
        f"({dt/(T*n)*1e9:5.2f} ns/row)")

    dt = slope(g26, jnp.float32(0.0), (packed_h, pidx))
    say(f"g26h [9,N]x52B f16:     {dt*1e3:8.1f} ms "
        f"({dt/(T*n)*1e9:5.2f} ns/row)")

    dt = slope(g26, jnp.float32(0.0), (packed_di[:, :1].copy(), pidx))
    say(f"g1   [9,N]x4B gather:   {dt*1e3:8.1f} ms "
        f"({dt/(T*n)*1e9:5.2f} ns/row)")

    # ---- select_try where-chains (k=3) on the unpacked planes
    cand_sd, cand_di = rr._unpack_record(packed_di[pidx], rr._DI_KEYS)
    cand_sd = jax.block_until_ready(cand_sd)

    def sel(x, csd0):
        csd = jax.tree.map(lambda p: p + x * 0.0, csd0)
        out = 0.0
        for v in range(3):
            idx_v = jnp.full((n,), v, jnp.int32)
            s = rr._select_try(csd, idx_v)
            out = out + s["x1"][0][0]
        return x + out * 1e-12
    dt = slope(sel, jnp.float32(0.0), (cand_sd,))
    say(f"sel  3x select_try:     {dt*1e3:8.1f} ms")

    # ---- DI accept chain
    cam_pos = tuple(float(cam["view_inv"][c, 3]) for c in range(3))

    def acc(x, csd0, cdi, sd):
        csd = jax.tree.map(lambda p: p + x * 0.0, csd0)
        a = (~restir.reject_normal_p(sd["n1"], csd["n1"], 0.9)
             & ~restir.reject_distance_p(sd["x1"], csd["x1"], cam_pos,
                                         0.1)
             & rr.is_valid_di_p(cdi)
             & (pv.length(csd["l1"]) == 0.0)
             & (csd["mid"] == sd["mid"]))
        return x + jnp.ravel(a.astype(jnp.float32))[0] * 1e-12
    dt = slope(acc, jnp.float32(0.0), (cand_sd, cand_di, sdata))
    say(f"acc  DI accept chain:   {dt*1e3:8.1f} ms")

    # ---- reservoir updates
    s2 = pixel_seed(xs, ys, 7, frame)

    def upd(x, od0, s0):
        od = dict(od0)
        od["w_sum"] = od["w_sum"] + x * 0.0
        s = s0
        for v in range(3):
            ok = jnp.ones((n,), bool)
            w = od["w_sum"] * 0.1
            od, _, s = rr.update_reservoir_p(
                od, rr._DI_KEYS, ok, w, od["m"],
                (od["x2"], od["n2"], od["l2"]), s)
        return x + od["w_sum"][0] * 1e-12
    dt = slope(upd, jnp.float32(0.0), (dict(res_di), s2))
    say(f"upd  3x reservoir upd:  {dt*1e3:8.1f} ms")

    # ---- p_hat evals
    mat = restir.fetch_material_p(sa, sdata["mid"])

    def ph(x, sd, rdi, m):
        acc_v = x
        x1p = jax.tree.map(lambda a: a + x * 0.0, sd["x1"])
        for i in range(7):
            p = restir.get_p_hat_di_p(
                sa, x1p, sd["n1"], rdi["x2"], rdi["n2"],
                rdi["l2"], sd["o"], m, False, cfg)
            acc_v = acc_v + p[0] * 1e-12
        return acc_v
    dt = slope(ph, jnp.float32(0.0), (sdata, res_di, mat))
    say(f"ph   7x p_hat_di:       {dt*1e3:8.1f} ms")

    # ---- TEA streams
    def tea(x, xs_, ys_):
        s = pixel_seed(xs_, ys_, 3, frame + jnp.uint32(x * 0.0))
        us, s = tea_batch_major(s, 2 * T)
        return x + us[0, 0] * 1e-12
    dt = slope(tea, jnp.float32(0.0), (xs, ys))
    say(f"tea  2T lanes RNG:      {dt*1e3:8.1f} ms")

    # ---- material fetch (27-col one-hot or gather)
    def mf(x, sd):
        m = restir.fetch_material_p(sa, (sd["mid"]
                                         + jnp.int32(x * 0.0)))
        return x + m["rough"][0] * 1e-12
    dt = slope(mf, jnp.float32(0.0), (sdata,))
    say(f"mf   fetch_material:    {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
