"""Round-3 part M: traversal-mode shootout on REAL flagship batches.

The r3k shootout used a benign primary-hit shadow batch; the passes'
actual batches (pass-3 candidate visibility, GI bounce continuations)
are far less tile-coherent, and the flat sweep's lockstep cost is the
per-tile UNION of overlapped clusters — incoherent tiles can degrade it
below brute.  Measures, on the real batches at 1080p:

  pass3 DI candidate visibility (3x2.07M segments):
      brute | flat fwd nosort | flat fwd sort | flat rev sort | rev nosort
  GI bounce-1 continuation closest (2.07M scattered rays):
      brute | flat nosort | flat sort
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
from royaltracer_dx_tpu.ops import restir, restir_gi, stream_trace as st
from royaltracer_dx_tpu.ops.intersect import any_hit_brute, closest_hit_brute
from royaltracer_dx_tpu.utils import pvec as pv
from royaltracer_dx_tpu.config import S_BIAS


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
    accel = sa.stream
    tris = sa.tri_verts
    n = cfg.num_pixels
    say(f"{W}x{H} N={n} accel={cfg.accel} stream={accel is not None}")

    r.render()
    jax.block_until_ready(r.fb.accum)
    cam = r._camera_arrays()
    frame = jnp.uint32(r.frame)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)

    # ---- the real pass-3 DI candidate visibility batch: from x1 (biased
    # along n1) toward the CURRENT reservoir's x2, k=3 copies
    o1 = pv.add(sdata["x1"], pv.scale(pv.normalize(sdata["n1"]), S_BIAS))
    d3 = pv.sub(res_di["x2"], sdata["x1"])
    dist = pv.length(d3)
    dn = pv.normalize(d3)
    o_aos = jnp.tile(pv.to_aos(o1), (3, 1))
    d_aos = jnp.tile(pv.to_aos(dn), (3, 1))
    tmax = jnp.tile(jnp.maximum(dist - 10.0 * S_BIAS, 2.0 * S_BIAS), 3)
    tmin = jnp.zeros_like(tmax)
    nb = tmax.shape[0]

    def ab(x, o, d, tn, tx):
        occ = any_hit_brute(o + x * 0.0, d, tris, tn, tx)
        return x + occ[0].astype(jnp.float32) * 1e-12
    dt = slope(ab, jnp.float32(0.0), (o_aos, d_aos, tmin, tmax))
    say(f"p3vis brute:          {dt*1e3:8.1f} ms ({dt/nb*1e9:5.1f} ns/ray)")

    for label, kw in (("flat fwd nosort", dict(presort=False)),
                      ("flat fwd sort  ", dict(presort=True)),
                      ("flat rev nosort", dict(presort=False, reverse=True)),
                      ("flat rev sort  ", dict(presort=True, reverse=True))):
        def af(x, o, d, tn, tx, kw=kw):
            occ = st.any_hit_stream_xla(o + x * 0.0, d, accel, tn, tx, **kw)
            return x + occ[0].astype(jnp.float32) * 1e-12
        dt = slope(af, jnp.float32(0.0), (o_aos, d_aos, tmin, tmax))
        say(f"p3vis {label}: {dt*1e3:8.1f} ms ({dt/nb*1e9:5.1f} ns/ray)")

    # parity spot check on the batch
    ob = any_hit_brute(o_aos, d_aos, tris, tmin, tmax)
    of = st.any_hit_stream_xla(o_aos, d_aos, accel, tmin, tmax)
    say("p3vis parity:", bool(np.array_equal(np.asarray(of), np.asarray(ob))),
        " occ", round(float(jnp.mean(ob.astype(jnp.float32))), 3))

    # ---- GI bounce-1 continuation rays (scattered origins + directions)
    st1 = rr.pass1_gi_init(sa, gi_in, seed, cfg)
    o_gi = pv.to_aos(st1["origin"])
    d_gi = pv.to_aos(pv.normalize(pv.neg(st1["outgoing"])))
    o_gi, d_gi = jax.block_until_ready((o_gi, d_gi))

    def cb(x, o, d):
        h = closest_hit_brute(o + x * 0.0, d, tris)
        return x + jnp.clip(h.t[0], 0.0, 1.0) * 1e-12
    dt = slope(cb, jnp.float32(0.0), (o_gi, d_gi))
    say(f"gi1 closest brute:    {dt*1e3:8.1f} ms ({dt/n*1e9:5.1f} ns/ray)")

    for label, ps in (("nosort", False), ("sort  ", True)):
        def cf(x, o, d, ps=ps):
            h = st.closest_hit_stream_xla(o + x * 0.0, d, accel,
                                          t_min=S_BIAS, presort=ps)
            return x + jnp.clip(h.t[0], 0.0, 1.0) * 1e-12
        dt = slope(cf, jnp.float32(0.0), (o_gi, d_gi))
        say(f"gi1 closest flat {label}: {dt*1e3:8.1f} ms "
            f"({dt/n*1e9:5.1f} ns/ray)")


if __name__ == "__main__":
    main()
