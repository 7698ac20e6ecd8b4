"""Round-3 part V: planar trace-boundary A/B at the 1080p flagship.

Measures (1) walled full-frame time, (2) slope-timed pass3, (3) the
fused pass-3-shaped visibility batch alone — after the planar
`_chunked_rays` / trace-entry rework (lane-padded [N, 3] buffers no
longer materialize at lax.map boundaries).  Compare to r3n baselines:
frame 4.17-4.18 s, pass3 1517 ms (vis 789 ms).
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


def say(*a):
    print(*a, flush=True)


def slope(fn, args, reps=(1, 3)):
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


def main():
    say("device:", jax.devices()[0])
    scene, camera = build_scene("reference")
    cfg = RenderConfig(width=1920, height=1080)
    r = rr.RestirRenderer(scene, camera, cfg)
    sa = r.scene_arrays

    t0 = time.perf_counter()
    r.render()
    say(f"first frame (compile): {time.perf_counter()-t0:.1f} s")
    jax.block_until_ready(r.fb.accum)
    t0 = time.perf_counter()
    for _ in range(3):
        r.render()
    say(f"frame walled:          {(time.perf_counter()-t0)/3*1e3:8.1f} ms"
        "   (r3n baseline 4170-4180)")

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

    p3 = rr.pass3_spatial.__wrapped__

    def run_pass3(x, cur_di, cur_gi, sdata):
        sd = dict(sdata)
        sd["x1"] = tuple(c + x * 0.0 for c in sd["x1"])
        rad, shading, od, og = p3(sa, cam, frame, dict(cur_di),
                                  dict(cur_gi), sd, cfg)
        return x + rad[0][0] * 1e-12

    dt = slope(run_pass3, (cur_di, cur_gi, sdata))
    say(f"pass3 slope:           {dt*1e3:8.1f} ms   (r3n baseline 1517)")

    # the fused 9xN visibility batch alone (pass-3 shape): 9 concatenated
    # queries surface->sample-point, live mask ~ shading
    n = cfg.num_pixels
    x1 = sdata["x1"]
    n1 = sdata["n1"]
    x2 = cur_di["x2"]
    live = (sdata["l1"][0] == 0.0)

    def vis_step(x, x1, n1, x2, live):
        x1j = tuple(c + x * 0.0 for c in x1)
        qs = [(x1j, n1, x2, live)] * 9
        v = restir.visibility_batch_p(sa, qs, cfg)
        return x + v[0][0] * 1e-12

    dt_v = slope(vis_step, (x1, n1, x2, live))
    say(f"fused 9x vis slope:    {dt_v*1e3:8.1f} ms  "
        f"({dt_v/(9*n)*1e9:.1f} ns/lane)")


if __name__ == "__main__":
    main()
