"""Round-3 part I: pass3/pass2/pass1 internals at 1080p, direct timing.

Direct best-of-3 wall timing (graphs here run 100s of ms — the ~5 ms
tunnel sync is noise; fori_loop slope-wrapping pass3 exceeds the remote
compile service's upload cap, HTTP 413).

Variants:
  p3 full | p3 no-trace (visibility stubbed) | p3 no-gather (candidate
  records replaced by center's own — kills the [N,26] spatial gathers
  but keeps all math) | p2 full | p2 no-trace | p1_di full | p1_gi full
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


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    say("device:", jax.devices()[0])
    scene, camera = build_scene("reference")
    W, H = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (1920, 1080)
    cfg = RenderConfig(width=W, height=H)
    r = RestirRenderer(scene, camera, cfg)
    sa = r.scene_arrays
    say(f"{W}x{H}, tris={int(sa.tri_verts.shape[0])}, accel={cfg.accel}")

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
    res_di2, res_gi2 = rr.pass2_temporal(
        sa, cam, frame, res_di, res_gi, sdata, packed_di, packed_gi, cfg)
    jax.block_until_ready(res_di2["w_sum"])

    # ---- pass1
    say(f"p1_di full:      "
        f"{timed(rr.pass1_di, sa, cam, frame, cfg)*1e3:8.1f} ms")

    def gi_all(sa, gi_in, seed, cfg):
        st = rr.pass1_gi_init(sa, gi_in, seed, cfg)
        for b in range(cfg.gi_bounces):
            st = rr.pass1_gi_bounce_compact(sa, cfg, st, jnp.uint32(b))
        return rr.pass1_gi_final(sa, gi_in, st, cfg)
    say(f"p1_gi full:      "
        f"{timed(gi_all, sa, gi_in, seed, cfg)*1e3:8.1f} ms")

    # ---- pass2
    say(f"p2 full:         "
        f"{timed(rr.pass2_temporal, sa, cam, frame, res_di, res_gi, sdata, packed_di, packed_gi, cfg)*1e3:8.1f} ms")

    # ---- pass3 full
    say(f"p3 full:         "
        f"{timed(rr.pass3_spatial, sa, cam, frame, res_di2, res_gi2, sdata, cfg)*1e3:8.1f} ms")

    # ---- pass3 with traces stubbed
    real_vis = restir.visibility_batch_p
    real_occ = restir.trace_occluded
    try:
        restir.visibility_batch_p = lambda scene, trips, cfg: [
            jnp.ones_like(t[0][0]) for t in trips]
        restir.trace_occluded = lambda scene, o, d, tmin, tmax, cfg: (
            jnp.zeros(o.shape[0], bool))
        rr.pass3_spatial.clear_cache()
        say(f"p3 no-trace:     "
            f"{timed(rr.pass3_spatial, sa, cam, frame, res_di2, res_gi2, sdata, cfg)*1e3:8.1f} ms")
        rr.pass3_spatial.clear_cache()

        # also stub the spatial candidate gathers: _spatial_tries returns
        # center pixel for every try (same math, no scattered gather)
        real_tries = rr._spatial_tries

        def center_tries(xs, ys, cfg, seed, row0=0, band_h=None):
            pidx, is_center, seed = real_tries(xs, ys, cfg, seed, row0,
                                               band_h)
            me = jnp.arange(pidx.shape[1], dtype=pidx.dtype)[None, :]
            return jnp.broadcast_to(me, pidx.shape), is_center, seed
        rr._spatial_tries = center_tries
        say(f"p3 no-trace, center-gather: "
            f"{timed(rr.pass3_spatial, sa, cam, frame, res_di2, res_gi2, sdata, cfg)*1e3:8.1f} ms")
    finally:
        restir.visibility_batch_p = real_vis
        restir.trace_occluded = real_occ
        rr._spatial_tries = real_tries
        rr.pass3_spatial.clear_cache()

    # ---- pass2 with traces stubbed
    try:
        restir.visibility_batch_p = lambda scene, trips, cfg: [
            jnp.ones_like(t[0][0]) for t in trips]
        restir.trace_occluded = lambda scene, o, d, tmin, tmax, cfg: (
            jnp.zeros(o.shape[0], bool))
        rr.pass2_temporal.clear_cache()
        say(f"p2 no-trace:     "
            f"{timed(rr.pass2_temporal, sa, cam, frame, res_di, res_gi, sdata, packed_di, packed_gi, cfg)*1e3:8.1f} ms")
    finally:
        restir.visibility_batch_p = real_vis
        restir.trace_occluded = real_occ
        rr.pass2_temporal.clear_cache()


if __name__ == "__main__":
    main()
