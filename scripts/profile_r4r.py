"""Round-4 part R: pass1_gi ledger at 1080p — standalone slopes of
gi_init / each gi_bounce / gi_finalize with NON-FOLDABLE perturbations
(r3n's gi_bounce row read 2.4 ms because `+ x * 0.0` folded and the
whole bounce hoisted out of the timing loop; this uses `+ x * 1e-20`
on the origin so every iteration re-executes).

Sites: gi_init = 1 scattered closest; bounce = 1 scattered closest +
NEE math; finalize = 1 any-hit.  Standalone closest on the same batch
measured 75-87 ms (r4f/r4h); pass1_gi total measured 979 ms (r4e) —
this script closes the ledger between those numbers.

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
    say(f"{W}x{H} N={cfg.num_pixels}")

    cam = r._camera_arrays()
    frame = jnp.uint32(7)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)
    jax.block_until_ready(res_di["w_sum"])

    # pass1_di slope (valid perturbation through the camera)
    def p1(x, cam_):
        cam2 = dict(cam_)
        cam2["view_inv"] = cam2["view_inv"] + x * 1e-20
        rd, sd, gi, s = rr.pass1_di(sa, cam2, frame, cfg)
        return x + rd["w_sum"][0] * 1e-12
    dt = slope(p1, (cam,))
    say(f"  pass1_di full        : {dt*1e3:8.1f} ms")

    def init_only(x, gi_in):
        g2 = dict(gi_in)
        g2["x1"] = tuple(c + x * 1e-20 for c in g2["x1"])
        st = rr.pass1_gi_init(sa, g2, seed, cfg)
        return x + st["acc_pdf"][0] * 1e-12
    dt = slope(init_only, (gi_in,))
    say(f"  gi_init (1 closest)  : {dt*1e3:8.1f} ms")

    st = rr.pass1_gi_init(sa, gi_in, seed, cfg)
    states = [st]
    for b in range(cfg.gi_bounces):
        states.append(rr.pass1_gi_bounce(sa, cfg, states[-1], jnp.uint32(b)))
    jax.block_until_ready(states[-1]["acc_pdf"])

    for b in range(cfg.gi_bounces):
        stb = states[b]

        def one_bounce(x, stb, b=b):
            s2 = dict(stb)
            s2["origin"] = tuple(c + x * 1e-20 for c in s2["origin"])
            out = rr.pass1_gi_bounce(sa, cfg, s2, jnp.uint32(b))
            return x + out["acc_pdf"][0] * 1e-12 \
                + out["reservoir"]["w_sum"][0] * 1e-12
        dt = slope(one_bounce, (stb,))
        act = float(jnp.mean(stb["active"].astype(jnp.float32)))
        say(f"  gi_bounce{b} (closest+NEE math): {dt*1e3:8.1f} ms "
            f"(active {act:.3f})")

    def final_only(x, stl, gi_in):
        s2 = dict(stl)
        s2["x1_shadow"] = tuple(c + x * 1e-20 for c in s2["x1_shadow"])
        res, s = rr.pass1_gi_final(sa, gi_in, s2, cfg)
        return x + res["w_sum"][0] * 1e-12
    dt = slope(final_only, (states[-1], gi_in))
    say(f"  gi_final (1 anyhit)  : {dt*1e3:8.1f} ms")

    # whole pass1_gi chained (the frame's real structure)
    def gi_all(x, gi_in):
        g2 = dict(gi_in)
        g2["x1"] = tuple(c + x * 1e-20 for c in g2["x1"])
        st = rr.pass1_gi_init(sa, g2, seed, cfg)
        for b in range(cfg.gi_bounces):
            st = rr.pass1_gi_bounce(sa, cfg, st, jnp.uint32(b))
        res, s = rr.pass1_gi_final(sa, g2, st, cfg)
        return x + res["w_sum"][0] * 1e-12
    dt = slope(gi_all, (gi_in,))
    say(f"  pass1_gi chained     : {dt*1e3:8.1f} ms")

    # pass2 full for the ledger
    res_gi, _ = rr.pass1_gi_final(sa, gi_in, states[-1], cfg)
    packed_di, packed_gi = rr._pack_last(
        r.last_di, r.last_gi, r.last_sdata, jnp.float32)

    def p2(x, cur_di, cur_gi, sdata, pd, pg):
        sd = dict(sdata)
        sd["x1"] = tuple(c + x * 1e-20 for c in sd["x1"])
        d, g = rr.pass2_temporal.__wrapped__(
            sa, cam, frame, dict(cur_di), dict(cur_gi), sd, pd, pg, cfg)
        return x + d["w_sum"][0] * 1e-12
    dt = slope(p2, (res_di, res_gi, sdata, packed_di, packed_gi))
    say(f"  pass2 full           : {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
