"""Benchmark driver: prints ONE JSON line with the headline metric.

Round-2 configuration: the BASELINE.json config table.  The headline
value is closest-hit traversal throughput on the ~1M-triangle terrain
(config 3's operating point) via the stream traversal — the component
VERDICT round 1 named as the round-2 crux — with the full table in
"extra": cornell megakernel (config 1), flagship ReSTIR on the
reference's shipped scene (config 2), 1M-triangle closest/occlusion
(config 3), many-light ReSTIR (config 4), device refit + animated frame
(config 5), and the RMSE harness numbers (ReSTIR vs the quirk-free
megakernel oracle — BASELINE.json accuracy bar).
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

# Watchdog: the tunneled chip can wedge indefinitely (observed: a stale
# remote lease after a client dies mid-dispatch makes every device call
# hang in C++ where Python signals never fire).  A daemon thread emits
# the JSON line with whatever was measured so far and hard-exits, so the
# driver always gets a record.
_WATCHDOG_S = float(os.environ.get("BENCH_WATCHDOG_S", 1500))
_partial: dict = {}


def _arm_watchdog():
    def fire():
        _partial.setdefault("extra", {})["watchdog"] = (
            f"bench exceeded {_WATCHDOG_S:.0f}s — tunneled device likely "
            "wedged; partial results emitted")
        print(json.dumps({
            "metric": _partial.get("metric", "Mrays/sec/chip closest-hit, "
                                   "1.0M-tri terrain (stream traversal)"),
            "value": _partial.get("value", 0.0),
            "unit": "Mrays/s",
            "vs_baseline": _partial.get("vs_baseline", 0.0),
            "extra": _partial.get("extra", {}),
        }), flush=True)
        os._exit(3)
    t = threading.Timer(_WATCHDOG_S, fire)
    t.daemon = True
    t.start()
    return t


def _sync(x):
    import jax

    jax.block_until_ready(x)


_ALL_REPS: dict = {}


def _timed(f, *args, reps=3, label=None):
    """Best-of-N timing; every rep is recorded in extra['reps'] so
    cross-round comparisons can see the ±40% tunnel variance."""
    f(*args)
    times = []
    r = None
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        _sync(r)
        times.append(time.perf_counter() - t0)
    if label:
        _ALL_REPS[label] = [round(t * 1e3, 2) for t in times]
    return min(times), r


def _slope(step, init, reps=(2, 6), label=None):
    """Sustained per-step time via the slope method: (T(k2)-T(k1))/(k2-k1)
    with the step iterated inside ONE jitted fori_loop.

    Direct per-dispatch timing through the tunneled chip carries ~35 ms
    of dispatch+readback that the renderer never pays (its traces run
    inside jitted passes): r3s measured the terrain closest trace at
    16.4 ms sustained vs ~52 ms walled.  Throughput rows use this;
    end-to-end frame rows keep wall timing."""
    import jax
    import numpy as _np

    times = {}
    for k in reps:
        @jax.jit
        def loop(c):
            return jax.lax.fori_loop(0, k, lambda i, c: step(c), c)
        r = loop(init)
        _np.asarray(jax.tree.leaves(r)[0].ravel()[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(init)
            _np.asarray(jax.tree.leaves(r)[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = reps
    dt = (times[k2] - times[k1]) / (k2 - k1)
    if label:
        _ALL_REPS[label] = {str(k): round(t * 1e3, 2)
                            for k, t in times.items()}
    return dt


def main():
    wd = _arm_watchdog()
    import jax
    import jax.numpy as jnp

    from royaltracer_dx_tpu import cache  # noqa: F401
    from royaltracer_dx_tpu.camera import Camera, generate_rays
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.ops import stream_trace as st
    from royaltracer_dx_tpu.render.megakernel import trace_paths_impl
    from royaltracer_dx_tpu.scene.procedural import cornell_box, heightfield
    from royaltracer_dx_tpu.utils.rng import pixel_seed

    extra: dict = {"device": str(jax.devices()[0])}
    _partial["extra"] = extra

    # per-dispatch tunnel overhead (sync + readback of a tiny jit call).
    # Wall-timed frame rows carry ~this much PER DISPATCH on top of the
    # device compute; it varies 5-36 ms day-to-day on the tunneled chip,
    # so cross-round wall comparisons need it (throughput rows use the
    # slope method and exclude it).
    f_tiny = jax.jit(lambda x: x + 1.0)
    xt = jnp.zeros((8, 128))
    _sync(f_tiny(xt))
    t0 = time.perf_counter()
    for _ in range(10):
        _sync(f_tiny(xt))
    extra["dispatch_overhead_ms"] = round(
        (time.perf_counter() - t0) / 10 * 1e3, 2)

    # ---- config 3 headline: 1M-triangle closest-hit (stream traversal)
    v, idx = heightfield(708)
    tris = jnp.asarray(v[idx])
    t0 = time.perf_counter()
    accel = st.build_stream_accel(tris)
    _sync(accel.top_lo)
    build_s = time.perf_counter() - t0
    W = H = 512
    cam = Camera(eye=(2.5, 2.2, 2.5), center=(0.0, 0.0, 0.0))
    ca = {k: jnp.asarray(vv) for k, vv in cam.matrices(1.0).items()}
    origins, dirs = generate_rays(ca, W, H)
    order, _ = st.swizzle_order(W, H, tile_w=8, tile_h=8)
    origins = origins[jnp.asarray(order)]
    dirs = dirs[jnp.asarray(order)]
    n = origins.shape[0]

    def _closest_step(o):
        h = st.closest_hit_stream_xla(o, dirs, accel)
        return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
    dt = _slope(_closest_step, origins, label="terrain_closest")
    t_hit = st.closest_hit_stream_xla(origins, dirs, accel).t
    mrays_closest = n / dt / 1e6
    _partial["value"] = round(mrays_closest, 2)
    _partial["vs_baseline"] = round(mrays_closest / 100.0, 4)
    assert bool(np.isfinite(np.asarray(t_hit)).any())

    # the on-device build EXECUTION cost (the BLAS-build analog the driver
    # pays per scene); build_s_cold above includes the one-time XLA
    # compile, which the axon tunnel's remote compile service makes
    # minutes-slow and which re-fires whenever the remote lease restarts
    # (new backend version = new persistent-cache key)
    t0 = time.perf_counter()
    accel = st.build_stream_accel(tris)
    _sync(accel.top_lo)
    build_exec_s = time.perf_counter() - t0

    # realistic shadow batch: segments from the primary hit SURFACE
    # points (unclamped t — a t<=2 clamp floats most points in mid-air
    # and the batch degenerates to ~0% occlusion) to a light INSIDE the
    # hill field (~16% occluded).  Forward segments: with the exact
    # per-ray block cull, reversed tracing lost its round-2 edge (r3p2
    # grid).  The VERDICT #4 comparison (ShadowRay.hlsl should be the
    # CHEAP query) is anyhit vs closest ON THE SAME segments.
    lp = jnp.asarray([0.0, 0.9, 0.0])
    t_s = jnp.where(t_hit < 1e29, t_hit, 2.0)
    p = origins + dirs * (t_s[:, None] * 0.999)
    ld = lp[None, :] - p
    dist = jnp.linalg.norm(ld, axis=1, keepdims=True)
    ld = ld / jnp.maximum(dist, 1e-6)
    tmax_s = dist[:, 0] - 1e-3

    def _any_step(o):
        occ = st.any_hit_stream_xla(o, ld, accel, 1e-3, tmax_s,
                                    presort=True)
        return o + occ[:, None].astype(jnp.float32) * 1e-9
    dt_a = _slope(_any_step, p, label="terrain_anyhit")
    occ_a = st.any_hit_stream_xla(p, ld, accel, 1e-3, tmax_s, presort=True)

    def _cs_step(o):
        h = st.closest_hit_stream_xla(o, ld, accel, 1e-3, tmax_s,
                                      presort=True)
        return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
    dt_cs = _slope(_cs_step, p, label="terrain_closest_on_shadow_batch")
    extra["terrain_1m"] = {
        "tris": int(tris.shape[0]),
        "build_s_cold": round(build_s, 2),
        "build_exec_s": round(build_exec_s, 3),
        "closest_mrays": round(mrays_closest, 2),
        "anyhit_mrays": round(n / dt_a / 1e6, 2),
        "anyhit_occ_frac": round(float(np.mean(np.asarray(occ_a))), 3),
        "closest_on_shadow_batch_mrays": round(n / dt_cs / 1e6, 2),
    }

    # ---- build-quality comparison (VERDICT r2 #3): device median (the
    # default quality build) vs device morton (cheapest) — build time and
    # traversal throughput for both
    try:
        t0 = time.perf_counter()
        accel_m = st.build_stream_accel(tris, method="morton")
        _sync(accel_m.top_lo)
        build_m = time.perf_counter() - t0
        def _cm_step(o, a=accel_m):
            h = st.closest_hit_stream_xla(o, dirs, a)
            return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
        dt_m2 = _slope(_cm_step, origins, label="terrain_closest_morton")
        extra["build_quality_1m"] = {
            "median_build_s": round(build_s, 3),
            "morton_build_s": round(build_m, 3),
            "median_closest_mrays": round(mrays_closest, 2),
            "morton_closest_mrays": round(n / dt_m2 / 1e6, 2),
        }
        del accel_m
    except Exception as e:
        extra["build_quality_error"] = repr(e)[:200]

    # ---- bunny / dragon traversal (BASELINE configs 3-4 named assets;
    # generated stand-ins at the same scale — scene/assets.py)
    try:
        from royaltracer_dx_tpu.scene.assets import ensure_asset
        from royaltracer_dx_tpu.scene.obj_loader import load_obj

        for aname, eye in (("bunny", (2.6, 1.8, 2.6)),
                           ("dragon", (6.5, 4.5, 6.5))):
            data = load_obj(ensure_asset(aname))
            atris = jnp.asarray(data["vertices"][data["indices"]])
            t0 = time.perf_counter()
            a_acc = st.build_stream_accel(atris)
            _sync(a_acc.top_lo)
            a_build = time.perf_counter() - t0
            acam = Camera(eye=eye, center=(0.0, 0.0, 0.0))
            aca = {k: jnp.asarray(vv) for k, vv in acam.matrices(1.0).items()}
            ao, ad = generate_rays(aca, W, H)
            ao = ao[jnp.asarray(order)]
            ad = ad[jnp.asarray(order)]
            def _ac_step(o, a=a_acc, ad=ad):
                h = st.closest_hit_stream_xla(o, ad, a)
                return o + jnp.clip(h.t[:, None], 0.0, 1.0) * 1e-9
            a_dt = _slope(_ac_step, ao, label=f"{aname}_closest")
            a_t = st.closest_hit_stream_xla(ao, ad, a_acc).t
            hitfrac = float(np.mean(np.asarray(a_t) < 1e29))
            extra[f"{aname}_closest"] = {
                "tris": int(atris.shape[0]),
                "build_s": round(a_build, 3),
                "mrays": round(n / a_dt / 1e6, 2),
                "hit_frac": round(hitfrac, 3),
            }
            del a_acc
    except Exception as e:
        extra["asset_bench_error"] = repr(e)[:200]

    # ---- device refit of the 1M structure (config 5's TLAS-refit analog)
    def _refit_step(t):
        a2 = st.refit_stream_accel(accel, t)
        return t + a2.top_lo[0, 0] * 1e-12
    dt_r = _slope(_refit_step, tris + 0.01, label="refit_1m")
    extra["refit_1m_ms"] = round(dt_r * 1e3, 2)

    # ---- config 1: cornell megakernel
    cfg = RenderConfig(width=512, height=512, max_bounces=5)
    scene = cornell_box().flatten()
    mcam = Camera(eye=(0.5, 0.6, 2.2), center=(0.5, 0.5, 0.0))
    mca = {k: jnp.asarray(vv) for k, vv in mcam.matrices(1.0).items()}
    mo, md = generate_rays(mca, 512, 512)
    ys, xs = np.meshgrid(np.arange(512), np.arange(512), indexing="ij")
    seeds = pixel_seed(jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()),
                       2, jnp.uint32(1))
    step = jax.jit(lambda o, d, s: trace_paths_impl(scene, o, d, s, cfg))
    dt_m, (_, rays_m) = _timed(step, mo, md, seeds)
    extra["cornell_megakernel"] = {
        "frame_ms": round(dt_m * 1e3, 2),
        "mrays": round(float(rays_m) / dt_m / 1e6, 2),
    }

    # ---- config 2: flagship ReSTIR on the reference scene + smoke checks
    try:
        from royaltracer_dx_tpu.cli import build_scene
        from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer

        rscene, rcam = build_scene("reference")
        rr = RestirRenderer(rscene, rcam, RenderConfig(width=256, height=256))
        rr.render()
        t0 = time.perf_counter()
        for _ in range(5):
            rr.render()
        rdt = (time.perf_counter() - t0) / 5
        img = rr.radiance()
        ch = img.mean(axis=(0, 1))
        assert np.isfinite(img).all(), "non-finite radiance on TPU"
        assert float(ch.std()) > 1e-3 * max(float(ch.mean()), 1e-6), (
            f"gray render on TPU (channel means {ch}) — material ids lost?")
        extra["restir_garage_256"] = {
            "frame_ms": round(rdt * 1e3, 2),
            "fps": round(1.0 / rdt, 2),
            "channel_means": [round(float(c), 4) for c in ch],
        }
    except Exception as e:  # bench must still emit its line
        extra["restir_error"] = repr(e)[:200]

    # ---- config 4: many-light ReSTIR (Sponza-class light count)
    try:
        from royaltracer_dx_tpu.scene.procedural import many_lights

        mscene, mcam2 = None, Camera(eye=(0.0, 1.1, 3.2), center=(0.0, 0.8, 0.0))
        mscene = many_lights()
        # width/height/aa_jitter match the RMSE section's ReSTIR config so
        # all three 96^2 ReSTIR sections share one compiled pipeline
        mrr = RestirRenderer(mscene, mcam2,
                             RenderConfig(width=96, height=96,
                                          aa_jitter=False))
        mrr.render()
        t0 = time.perf_counter()
        for _ in range(3):
            mrr.render()
        mdt = (time.perf_counter() - t0) / 3
        mimg = mrr.radiance()
        assert np.isfinite(mimg).all()
        extra["many_lights_96"] = {
            "lights": int(mrr.scene_arrays.lights.count),
            "frame_ms": round(mdt * 1e3, 2),
        }
    except Exception as e:
        extra["many_lights_error"] = repr(e)[:200]

    # ---- Sponza-class ReSTIR (generated atrium: 265k tris, 48 lamps)
    try:
        sscene, scam = build_scene("sponza")
        srr = RestirRenderer(sscene, scam,
                             RenderConfig(width=128, height=128))
        srr.render()
        t0 = time.perf_counter()
        for _ in range(3):
            srr.render()
        sdt = (time.perf_counter() - t0) / 3
        simg = srr.radiance()
        assert np.isfinite(simg).all()
        extra["sponza_restir_128"] = {
            "tris": int(srr.scene_arrays.tri_verts.shape[0]),
            "lights": int(srr.scene_arrays.lights.count),
            "frame_ms": round(sdt * 1e3, 2),
            "mrays": round(srr.metrics.get("mrays_per_s", 0.0), 2),
        }
    except Exception as e:
        extra["sponza_error"] = repr(e)[:200]

    # ---- config 5: dynamic scene — animated instance + device refit + frame
    try:
        import numpy as _np

        ascene, acam = build_scene("reference")
        arr = RestirRenderer(ascene, acam,
                             RenderConfig(width=96, height=96,
                                          aa_jitter=False))
        arr.render()
        t0 = time.perf_counter()
        for i in range(3):
            ang = 0.3 * (i + 1)
            c, s = float(np.cos(ang)), float(np.sin(ang))
            m = _np.asarray([[c, 0, s, 0], [0, 1, 0, 0],
                             [-s, 0, c, 0], [0, 0, 0, 1]], _np.float32)
            ascene.set_transform(1, m)
            arr.update()
            arr.render()
        adt = (time.perf_counter() - t0) / 3
        aimg = arr.radiance()
        assert np.isfinite(aimg).all()
        extra["dynamic_refit_frame_96_ms"] = round(adt * 1e3, 2)
    except Exception as e:
        extra["dynamic_error"] = repr(e)[:200]

    # ---- RMSE harness (BASELINE accuracy bar) at 96^2 on device
    try:
        from royaltracer_dx_tpu.render.renderer import Renderer
        from royaltracer_dx_tpu.utils.metrics import rel_mean, rmse

        W2 = 96
        hcam = Camera(eye=(0.5, 0.5, 1.72), center=(0.5, 0.5, 0.0))
        orc = Renderer(cornell_box(emission=18.0), hcam,
                       RenderConfig(width=W2, height=W2, max_bounces=5,
                                    aa_jitter=False,
                                    reference_mis_quirk=False))
        for _ in range(200):
            orc.render()
        ora = orc.radiance()
        rr2 = RestirRenderer(cornell_box(emission=18.0), hcam,
                             RenderConfig(width=W2, height=W2,
                                          aa_jitter=False))
        for _ in range(100):
            rr2.render()
        img2 = rr2.radiance()
        extra["rmse_vs_oracle"] = {
            "rmse": round(rmse(img2, ora), 5),
            "rel_mean": round(rel_mean(img2, ora), 5),
            "frames": [200, 100],
        }
    except Exception as e:
        extra["rmse_error"] = repr(e)[:200]

    # ---- converged DI RMSE vs the MIS-free DiOracle (the BASELINE
    # <=5e-3 accuracy bar; VERDICT r2 #5).  The DiOracle consumes pass1's
    # own jitted primary-hit geometry (render/di_oracle.py), so the
    # comparison isolates the DI estimator chain (RIS + W + temporal +
    # spatial + pairwise MIS + visibility) from ulp-level geometry
    # divergence.  Full converged study: scripts/rmse_study.py (128^2,
    # 2400/1200 frames -> RMSE 0.0032 no-reuse .. 0.0077 full-reuse,
    # BASELINE.md round-3 accuracy section); this row is the bounded
    # on-device re-measurement at 64^2.
    try:
        from royaltracer_dx_tpu.render.di_oracle import DiOracle

        W3 = 64
        dora = DiOracle(cornell_box(emission=18.0), hcam,
                        RenderConfig(width=W3, height=W3))
        for _ in range(800):
            dora.render()
        dimg = dora.radiance()
        rr3 = RestirRenderer(cornell_box(emission=18.0), hcam,
                             RenderConfig(width=W3, height=W3,
                                          aa_jitter=False, gi_bounces=0))
        for _ in range(400):
            rr3.render()
        di_img = rr3.radiance()
        extra["rmse_di_vs_dioracle_64"] = {
            "rmse": round(rmse(di_img, dimg), 5),
            "rel_mean": round(rel_mean(di_img, dimg), 5),
            "frames": [800, 400],
            "bar": 5e-3,
        }
    except Exception as e:
        extra["rmse_di_error"] = repr(e)[:200]

    # ---- f16 packed-record delta (VERDICT r2 #8): frame time + image
    # delta of the half-precision inter-pixel gather tables at 256^2
    try:
        rr16 = RestirRenderer(build_scene("reference")[0], rcam,
                              RenderConfig(width=256, height=256,
                                           record_dtype="f16"))
        rr16.render()
        t0 = time.perf_counter()
        for _ in range(5):
            rr16.render()
        rdt16 = (time.perf_counter() - t0) / 5
        from royaltracer_dx_tpu.utils.metrics import rmse as _rmse
        extra["f16_records_256"] = {
            "frame_ms": round(rdt16 * 1e3, 2),
            "f32_frame_ms": extra.get("restir_garage_256", {}).get("frame_ms"),
            "rmse_vs_f32_1frame": round(_rmse(rr16.radiance(), img), 5),
        }
    except Exception as e:
        extra["f16_error"] = repr(e)[:200]

    # ---- VERDICT r2 #2: the reference's 1080p operating point (garage
    # ReSTIR, 1920x1080).  LAST: the cold 1080p compile can take minutes
    # when the remote compile cache misses, and the watchdog emits all
    # rows recorded so far if the budget runs out.
    try:
        frr = RestirRenderer(build_scene("reference")[0], rcam,
                             RenderConfig(width=1920, height=1080))
        t0 = time.perf_counter()
        frr.render()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            frr.render()
        fdt = (time.perf_counter() - t0) / 3
        fimg = frr.radiance()
        assert np.isfinite(fimg).all()
        extra["restir_garage_1080p"] = {
            "frame_s": round(fdt, 3),
            "fps": round(1.0 / fdt, 3),
            "first_frame_s": round(compile_s, 1),
            "mrays_per_s": round(frr.metrics.get("mrays_per_s", 0.0), 2),
        }
    except Exception as e:
        extra["flagship_1080p_error"] = repr(e)[:200]

    extra["reps_ms"] = _ALL_REPS
    wd.cancel()
    print(json.dumps({
        "metric": "Mrays/sec/chip closest-hit, 1.0M-tri terrain, 512x512 "
                  "coherent rays (stream traversal)",
        "value": round(mrays_closest, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_closest / 100.0, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
