"""Round-4 part P: gather cost model + fine-cluster occlusion A/B.

(1) r3n pinned the pass-3 spatial-tap machinery at ~100 ms per [9, N]
S0 gather block at 1080p (the r4j "2.4 ms" standalone row was
DCE-broken — it only consumed row 0).  Pass 3 issues ~30M such row
gathers per frame, so the per-row cost model decides the next move:
if the ~5 ns/row is LATENCY (row-count bound), narrowing rows does
nothing and the fix is fewer taps; if it's BYTES, f16 shards halve it.
This measures [T*N] gathers from [N, w] tables at w = 8f32 / 8f16 /
4f32 / 2f32 / 1f32, consuming every gathered element.

(2) The 9N fused pass-3 visibility batch runs at the coarse flat-path
MT floor (~19 clusters * 64 tris/lane).  The fine flat path (gf=16)
was a measured NEGATIVE for the whole frame, but occlusion pays no
epilogue and its worklists are fatter — A/B it on the real pass-3
segment batch.

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
from royaltracer_dx_tpu.ops import stream_trace as stx
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
    n = 2073600
    t_taps = 9
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (t_taps, n), 0, n, dtype=jnp.int32)

    for w, dt_ in ((8, jnp.float32), (8, jnp.float16), (4, jnp.float32),
                   (2, jnp.float32), (1, jnp.float32)):
        tab = jnp.arange(n * w, dtype=jnp.float32).reshape(n, w)
        tab = tab.astype(dt_)

        def g(x, tab, idx):
            pix = (idx + x.astype(jnp.int32) * 0) % n
            r0 = tab[pix].astype(jnp.float32)       # [T, N, w]
            return x + jnp.sum(r0) * 1e-12
        dt = slope(g, (tab, idx))
        rows = t_taps * n
        say(f"  gather [{t_taps}x{n}] rows from [N,{w}] {dt_.__name__:8s}:"
            f" {dt*1e3:8.1f} ms ({dt/rows*1e9:5.2f} ns/row)")

    # gather with LOCAL indices (taps within +-30 rows like the real
    # disk samples) — does locality change the cost?
    w = 1920
    off = jax.random.randint(key, (t_taps, n), -30 * w, 30 * w,
                             dtype=jnp.int32)
    idx_loc = jnp.clip(jnp.arange(n, dtype=jnp.int32)[None, :] + off,
                       0, n - 1)
    tab = jnp.arange(n * 8, dtype=jnp.float32).reshape(n, 8)

    def g2(x, tab, idx_loc):
        pix = (idx_loc + x.astype(jnp.int32) * 0) % n
        r0 = tab[pix]
        return x + jnp.sum(r0) * 1e-12
    dt = slope(g2, (tab, idx_loc))
    say(f"  gather local +-30 rows from [N,8] f32   : {dt*1e3:8.1f} ms "
        f"({dt/(t_taps*n)*1e9:5.2f} ns/row)")

    # ---- fine flat occlusion A/B on the real pass-3 segment batch
    scene, camera = build_scene("reference")
    cfg = RenderConfig(width=1920, height=1080)
    r = rr.RestirRenderer(scene, camera, cfg)
    sa = r.scene_arrays
    cam = r._camera_arrays()
    frame = jnp.uint32(7)
    res_di, sdata, gi_in, seed = rr.pass1_di(sa, cam, frame, cfg)
    jax.block_until_ready(res_di["w_sum"])
    x1, n1 = sdata["x1"], sdata["n1"]
    x2 = res_di["x2"]
    live = gi_in["sampling"]
    o = pv.add(x1, pv.scale(pv.normalize(n1), restir.S_BIAS))
    d = pv.sub(x2, x1)
    dist = pv.length(d)
    dirs = pv.normalize(d)
    t_max = jnp.where(live, jnp.maximum(dist - 10.0 * restir.S_BIAS,
                                        2.0 * restir.S_BIAS), -1.0)
    accel = sa.stream

    def anyhit(x):
        occ = stx.any_hit_stream_xla(
            tuple(c + x * 1e-20 for c in o), dirs, accel,
            jnp.zeros_like(t_max), t_max)
        return x + jnp.sum(occ[:8].astype(jnp.float32)) * 1e-12

    ref = None
    for gf in (None, 16, 32):
        stx._FLAT_FINE_G = gf
        jax.clear_caches()
        occ = jax.jit(lambda: stx.any_hit_stream_xla(
            o, dirs, accel, jnp.zeros_like(t_max), t_max))()
        snap = np.asarray(occ)
        if ref is None:
            ref = snap
        else:
            assert np.array_equal(ref, snap), f"gf={gf} mismatch"
        dt = slope(anyhit)
        say(f"  pass3-segs anyhit gf={str(gf):4s}: {dt*1e3:8.1f} ms "
            f"({dt/cfg.num_pixels*1e9:5.1f} ns/lane)")
    stx._FLAT_FINE_G = None


if __name__ == "__main__":
    main()
