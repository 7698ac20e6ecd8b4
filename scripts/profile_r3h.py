"""Round-3 part H: what does the 1080p garage flagship frame spend?

Slope-times, on the real 1920x1080 reference scene (2.2k tris):
  t1  one brute closest trace, 2.07M rays          (pass-1 primary unit)
  t2  one brute any-hit,      2.07M rays           (shadow unit)
  t3  one k=3 batched any-hit (6.2M segments)      (pass-3 vis unit)
  t4  stream closest at the same rays              (small-scene alt)
  t5  cluster closest at the same rays             (small-scene alt)
  p3  pass3_spatial full
  p3nt pass3_spatial with visibility stubbed to 1  (VPU+gather share)
  ph  7x get_p_hat_di_p                            (p-hat unit)
  sg  _spatial_tries + record unpack (DI+GI)       (gather share)
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


def say(*a):
    print(*a, flush=True)


def slope(step, init, reps=(2, 6)):
    times = {}
    for k in reps:
        @jax.jit
        def loop(c):
            return jax.lax.fori_loop(0, k, lambda i, c: step(c), c)
        r = loop(init)
        np.asarray(jax.tree.leaves(r)[0].ravel()[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(init)
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
    say(f"{W}x{H}, tris={int(sa.tri_verts.shape[0])}, accel={cfg.accel}")

    # one real frame for realistic state
    r.render()
    jax.block_until_ready(r.fb.accum)

    cam = r._camera_arrays()
    frame = jnp.uint32(r.frame)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)
    st = rr.pass1_gi_init(sa, gi_in, seed, cfg)
    for b in range(cfg.gi_bounces):
        st = rr.pass1_gi_bounce_compact(sa, cfg, st, jnp.uint32(b))
    res_gi, _ = rr.pass1_gi_final(sa, gi_in, st, cfg)
    packed_di, packed_gi = rr._pack_last(
        r.last_di, r.last_gi, r.last_sdata, jnp.float32)
    res_di, res_gi = rr.pass2_temporal(
        sa, cam, frame, res_di, res_gi, sdata, packed_di, packed_gi, cfg)
    jax.block_until_ready(res_di["w_sum"])

    from royaltracer_dx_tpu.camera import generate_rays
    origins, dirs = generate_rays(cam, W, H)
    origins = jnp.asarray(origins)
    dirs = jnp.asarray(dirs)

    # ---- t1: brute closest, full res
    def t1(x):
        hit = restir.trace_closest_p(sa, origins + x * 0.0, dirs, cfg,
                                     t_min=1e-4)
        return x + jnp.clip(hit["pos"][0][0], 0.0, 1.0) * 1e-12
    dt = slope(t1, jnp.float32(0.0))
    say(f"t1 closest 2.07M ({cfg.accel}): {dt*1e3:8.1f} ms "
        f"({dt/n*1e9:6.1f} ns/ray)")

    # ---- t2: any-hit, full res
    x1 = jnp.stack([sdata["x1"][c] for c in range(3)], axis=1)
    lp = jnp.asarray([0.0, 2.0, 0.0])
    ld = lp[None, :] - x1
    dist = jnp.linalg.norm(ld, axis=1)
    ldn = ld / jnp.maximum(dist, 1e-6)[:, None]

    def t2(x):
        occ = restir.trace_occluded(sa, x1 + x * 0.0, ldn,
                                    jnp.zeros_like(dist), dist - 1e-3, cfg)
        return x + occ[0].astype(jnp.float32) * 1e-12
    dt = slope(t2, jnp.float32(0.0))
    say(f"t2 anyhit  2.07M ({cfg.accel}): {dt*1e3:8.1f} ms "
        f"({dt/n*1e9:6.1f} ns/ray)")

    # ---- t3: the pass-3 batched candidate visibility (3x segments)
    from royaltracer_dx_tpu.utils import pvec as pv
    trip = [(sdata["x1"], sdata["n1"], res_di["x2"]) for _ in range(3)]

    def t3(x):
        sh = jax.tree.map(lambda a: a + x * 0.0, sdata["x1"])
        vis = restir.visibility_batch_p(sa, [(sh, t[1], t[2])
                                             for t in trip], cfg)
        return x + vis[0][0] * 1e-12
    dt = slope(t3, jnp.float32(0.0))
    say(f"t3 vis batch k=3 (6.2M):      {dt*1e3:8.1f} ms "
        f"({dt/(3*n)*1e9:6.1f} ns/ray)")

    # ---- t4/t5: alternate traversals on the same scene
    for mode in ("stream", "cluster"):
        try:
            cfg2 = RenderConfig(width=W, height=H, traversal=mode)
            r2 = RestirRenderer(scene, camera, cfg2)
            sa2 = r2.scene_arrays

            def t4(x, sa2=sa2, cfg2=cfg2):
                hit = restir.trace_closest_p(sa2, origins + x * 0.0, dirs,
                                             cfg2, t_min=1e-4)
                return x + jnp.clip(hit["pos"][0][0], 0.0, 1.0) * 1e-12
            dt = slope(t4, jnp.float32(0.0))
            say(f"t4 closest 2.07M ({mode}): {dt*1e3:8.1f} ms "
                f"({dt/n*1e9:6.1f} ns/ray)")
        except Exception as e:
            say(f"t4 {mode} failed: {type(e).__name__}: {e}")

    # ---- p3: full pass3
    def p3(x):
        sd = dict(sdata)
        sd["x1"] = jax.tree.map(lambda a: a + x * 0.0, sdata["x1"])
        sample, shaded, od, og = rr.pass3_spatial(
            sa, cam, frame, res_di, res_gi, sd, cfg)
        return x + sample[0, 0] * 1e-12
    dt = slope(p3, jnp.float32(0.0), reps=(1, 3))
    say(f"p3 pass3 full:                {dt*1e3:8.1f} ms")

    # ---- p3nt: pass3 with visibility stubbed (VPU+gather share)
    real_vis = restir.visibility_batch_p
    real_occ = restir.trace_occluded
    try:
        restir.visibility_batch_p = lambda scene, trips, cfg: [
            jnp.ones_like(t[0][0]) for t in trips]
        restir.trace_occluded = lambda scene, o, d, tmin, tmax, cfg: (
            jnp.zeros(o.shape[0], bool))
        rr.pass3_spatial.clear_cache()

        def p3nt(x):
            sd = dict(sdata)
            sd["x1"] = jax.tree.map(lambda a: a + x * 0.0, sdata["x1"])
            sample, shaded, od, og = rr.pass3_spatial(
                sa, cam, frame, res_di, res_gi, sd, cfg)
            return x + sample[0, 0] * 1e-12
        dt = slope(p3nt, jnp.float32(0.0), reps=(1, 3))
        say(f"p3nt pass3 no-trace:          {dt*1e3:8.1f} ms")
    finally:
        restir.visibility_batch_p = real_vis
        restir.trace_occluded = real_occ
        rr.pass3_spatial.clear_cache()

    # ---- ph: 7x p_hat_di (the pass-3 shading-math unit)
    mat = restir.fetch_material_p(sa, sdata["mid"])

    def ph(x):
        acc = x
        for i in range(7):
            p = restir.get_p_hat_di_p(
                sa, jax.tree.map(lambda a: a + x * 0.0, sdata["x1"]),
                sdata["n1"], res_di["x2"], res_di["n2"], res_di["l2"],
                sdata["o"], mat, False, cfg)
            acc = acc + p[0] * 1e-12
        return acc
    dt = slope(ph, jnp.float32(0.0))
    say(f"ph 7x p_hat_di:               {dt*1e3:8.1f} ms")

    # ---- sg: spatial tries + record gathers/unpack (DI+GI)
    xs, ys = rr._pixel_grid(cfg)
    pk_di = rr._pack_record(sdata, res_di, rr._DI_KEYS, jnp.float32)
    pk_gi = rr._pack_record(sdata, res_gi, rr._GI_KEYS, jnp.float32)

    def sg(x):
        s = rr.pixel_seed(xs, ys, 3, frame)
        pidx, isc, s = rr._spatial_tries(xs, ys, cfg, s, 0, None)
        c1, d1 = rr._unpack_record((pk_di + x * 0.0)[pidx], rr._DI_KEYS)
        pidx2, isc2, s = rr._spatial_tries(xs, ys, cfg, s, 0, None)
        c2, d2 = rr._unpack_record((pk_gi + x * 0.0)[pidx2], rr._GI_KEYS)
        return (x + jnp.ravel(c1["x1"][0])[0] * 1e-12
                + jnp.ravel(c2["x1"][0])[0] * 1e-12)
    dt = slope(sg, jnp.float32(0.0))
    say(f"sg tries+gathers DI+GI:       {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
