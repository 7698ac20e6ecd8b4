"""Benchmark driver: prints ONE JSON line with the headline metric.

Round-5 evidence design (VERDICT r4 #1 — two consecutive rounds lost the
whole table to the driver's outer kill):

- ``_WATCHDOG_S`` defaults to 1140 s, provably inside the driver's kill
  budget (r3's 1500 s watchdog fired in time; r4's 2400 s did not).
- **Every section completion emits a FULL cumulative result line** (same
  schema as the final line, plus ``"partial": true`` and the section
  name).  A hard SIGKILL at any point leaves the most recent complete
  snapshot as the last parseable line on stdout — no finished row can be
  lost again.  The final line is identical minus ``partial``.
- Required rows (garage-256, f16, 1080p, rmse_di, rmse, terrain — the
  VERDICT r4 minimum set) run FIRST and are not budget-gated (only a
  30 s floor); optional rows keep the round-4 budget gating.

The headline metric stays the 1M-triangle terrain closest-hit rate
(BASELINE.json north star); until terrain lands, the flagship fps row is
the headline so ``value`` is never silently 0.
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
# driver always gets a record.  1140 s < the driver's observed kill
# budget (>1500 s fired in r3, <2400 s did not in r4).
_WATCHDOG_S = float(os.environ.get("BENCH_WATCHDOG_S", 1195))
_T0 = time.perf_counter()
_partial: dict = {}


def _result_line(partial: dict) -> dict:
    extra = partial.get("extra", {})
    if "value" in partial:
        metric = ("Mrays/sec/chip closest-hit, 1.0M-tri terrain, 512x512 "
                  "coherent rays (stream traversal)")
        value = partial["value"]
        unit = "Mrays/s"
        vs = partial.get("vs_baseline", 0.0)
    elif "restir_garage_256" in extra:
        metric = "ReSTIR garage 256^2 fps (terrain row not reached)"
        value = extra["restir_garage_256"].get("fps", 0.0)
        unit = "fps"
        vs = 0.0
    else:
        metric = "no rows measured"
        value, unit, vs = 0.0, "", 0.0
    return {"metric": metric, "value": value, "unit": unit,
            "vs_baseline": vs, "extra": extra}


def _emit(partial: dict, section: str | None = None):
    line = _result_line(partial)
    if section is not None:
        line["partial"] = True
        line["after_section"] = section
        line["elapsed_s"] = round(time.perf_counter() - _T0, 1)
    print(json.dumps(line), flush=True)


def _arm_watchdog():
    def fire():
        _partial.setdefault("extra", {})["watchdog"] = (
            f"bench exceeded {_WATCHDOG_S:.0f}s — tunneled device likely "
            "wedged; partial results emitted")
        _emit(_partial)
        os._exit(3)
    t = threading.Timer(_WATCHDOG_S, fire)
    t.daemon = True
    t.start()
    return t


def _left() -> float:
    return _WATCHDOG_S - (time.perf_counter() - _T0)


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


def _section(extra: dict, name: str, est_s: float, fn, required=False):
    """Run one bench section and emit a cumulative snapshot line after.

    Required sections only need a 30 s floor (the watchdog + incremental
    emission protect against overrun); optional sections are gated on
    ``est_s`` (worst-case cost incl. cold remote-XLA compiles) so one hog
    cannot eat the cheaper rows behind it."""
    floor = 30.0 if required else est_s
    if _left() < floor:
        extra[name + "_skipped"] = (
            f"budget: {_left():.0f}s left < {floor:.0f}s "
            + ("floor" if required else "estimate"))
        _emit(_partial, section=name)
        return
    t0 = time.perf_counter()
    try:
        fn()
    except Exception as e:  # bench must still emit its line
        extra[name + "_error"] = repr(e)[:200]
    extra.setdefault("section_s", {})[name] = round(
        time.perf_counter() - t0, 1)
    _emit(_partial, section=name)


def main():
    wd = _arm_watchdog()
    import jax
    import jax.numpy as jnp

    from royaltracer_dx_tpu import cache  # noqa: F401
    from royaltracer_dx_tpu.camera import Camera, generate_rays
    from royaltracer_dx_tpu.cli import build_scene
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.ops import stream_trace as st
    from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer
    from royaltracer_dx_tpu.scene.procedural import cornell_box, heightfield
    from royaltracer_dx_tpu.utils.metrics import rel_mean, rmse

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

    # device-state calibration: the tunneled chip's SUSTAINED rates vary
    # up to ~1.8x process-to-process (round-4 measurements: the same
    # garage-256 coarse pipeline walled 175 ms in one process and 314 ms
    # in another, minutes apart).  These two primitive rates anchor every
    # wall row so cross-round comparisons can normalize for device state.
    try:
        xcal = jnp.ones((16 * 1024 * 1024,), jnp.float32)

        @jax.jit
        def _ew(c):
            return jax.lax.fori_loop(
                0, 50, lambda i, c: c * 1.000001 + 0.5 - 0.25 * c, c)
        np.asarray(_ew(xcal)[0])
        t0 = time.perf_counter()
        np.asarray(_ew(xcal)[0])
        dt_ew = time.perf_counter() - t0
        kcal = jnp.arange(2 * 1024 * 1024, dtype=jnp.int32)[::-1]

        @jax.jit
        def _srt(k):
            return jax.lax.fori_loop(
                0, 10, lambda i, c: jax.lax.sort(c ^ i), k)
        np.asarray(_srt(kcal)[0])
        t0 = time.perf_counter()
        np.asarray(_srt(kcal)[0])
        dt_s = time.perf_counter() - t0
        extra["device_calib"] = {
            "elementwise_gbps": round(50 * 128e6 / dt_ew / 1e9, 1),
            "sort_2m_ms": round(dt_s / 10 * 1e3, 3),
        }
    except Exception as e:
        extra["calib_error"] = repr(e)[:120]
    _emit(_partial, section="calib")

    # ============== required rows (VERDICT r4 minimum set) ===============

    # ---- config 2: flagship ReSTIR on the reference scene + smoke checks
    state = {}

    def s_garage_256():
        rscene, rcam = build_scene("reference")
        state["rcam"] = rcam
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
        # one profiled frame: per-pass wall splits (each sync is a tunnel
        # round trip, so this row is indicative, not additive)
        rr.profile = True
        rr.render()
        passes = {k: round(v * 1e3, 1)
                  for k, v in rr.metrics.get("pass_times_s", {}).items()}
        rr.profile = False
        # batched frames (render_many: whole frames inside ONE jit) — the
        # sustained operating point without per-dispatch tunnel overhead,
        # and the fused-frame composition A/B vs frame_ms
        rr.render_many(5)
        t0 = time.perf_counter()
        rr.render_many(5)
        batch_ms = (time.perf_counter() - t0) / 5 * 1e3
        extra["restir_garage_256"] = {
            "frame_ms": round(rdt * 1e3, 2),
            "frame_ms_batched": round(batch_ms, 2),
            "fps": round(1.0 / rdt, 2),
            "channel_means": [round(float(c), 4) for c in ch],
            "pass_ms_profiled": passes,
        }
        state["img256"] = img

    _section(extra, "garage_256", est_s=300, fn=s_garage_256, required=True)

    # ---- f16 packed-record delta (VERDICT r2 #8 / r4 #5): frame time +
    # image delta of the half-precision inter-pixel gather tables at 256^2
    def s_f16():
        rr16 = RestirRenderer(build_scene("reference")[0], state["rcam"],
                              RenderConfig(width=256, height=256,
                                           record_dtype="f16"))
        rr16.render()
        t0 = time.perf_counter()
        for _ in range(5):
            rr16.render()
        rdt16 = (time.perf_counter() - t0) / 5
        row = {
            "frame_ms": round(rdt16 * 1e3, 2),
            "f32_frame_ms": extra.get("restir_garage_256", {}).get("frame_ms"),
        }
        if "img256" in state:
            row["rmse_vs_f32_1frame"] = round(
                rmse(rr16.radiance(), state["img256"]), 5)
        extra["f16_records_256"] = row

    _section(extra, "f16_records", est_s=200, fn=s_f16, required=True)

    # ---- VERDICT r3 #1: the reference's 1080p operating point
    def s_garage_1080p():
        frr = RestirRenderer(build_scene("reference")[0], state["rcam"],
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
        row = {
            "frame_s": round(fdt, 3),
            "fps": round(1.0 / fdt, 3),
            "first_frame_s": round(compile_s, 1),
            "mrays_per_s": round(frr.metrics.get("mrays_per_s", 0.0), 2),
            "channel_means": [round(float(c), 4)
                              for c in fimg.mean(axis=(0, 1))],
        }
        # in-frame pass ticks + the pass2 composition ratio (VERDICT r4
        # #2).  r5a root cause: r4's "8x anomaly" was a bad STANDALONE
        # measurement — with real chained inputs pass2 costs ~192 ms
        # standalone vs ~198 in-frame (ratio ~1.03).  The ratio is
        # re-measured here in-artifact: pass2_temporal is already jitted
        # and warm, so the standalone reps are cheap.
        frr.profile = True
        frr.render()
        frr.profile = False
        passes = {k: round(v * 1e3, 1)
                  for k, v in frr.metrics.get("pass_times_s", {}).items()}
        row["pass_ms_profiled"] = passes
        try:
            from royaltracer_dx_tpu.render import restir_renderer as _rrm
            cfgf = frr.cfg
            camf = frr._camera_arrays()
            fr7 = jnp.uint32(7)
            res_di, sdata, gi_in, seed = _rrm.pass1_di(
                frr.scene_arrays, camf, fr7, cfgf)
            gst = _rrm.pass1_gi_init(frr.scene_arrays, gi_in, seed, cfgf)
            for b in range(cfgf.gi_bounces):
                gst = _rrm.pass1_gi_bounce(frr.scene_arrays, cfgf, gst,
                                           jnp.uint32(b))
            res_gi, _ = _rrm.pass1_gi_final(frr.scene_arrays, gi_in, gst,
                                            cfgf)
            pd, pg = _rrm._pack_last(frr.last_di, frr.last_gi,
                                     frr.last_sdata, _rrm._rec_dtype(cfgf))
            _sync(_rrm.pass2_temporal(frr.scene_arrays, camf, fr7, res_di,
                                      res_gi, sdata, pd, pg, cfgf))
            t0 = time.perf_counter()
            for _ in range(3):
                _sync(_rrm.pass2_temporal(frr.scene_arrays, camf, fr7,
                                          res_di, res_gi, sdata, pd, pg,
                                          cfgf))
            p2_alone = (time.perf_counter() - t0) / 3 * 1e3
            row["pass2_standalone_ms"] = round(p2_alone, 1)
            if passes.get("pass2_temporal"):
                row["pass2_inframe_over_standalone"] = round(
                    passes["pass2_temporal"] / p2_alone, 2)
        except Exception as e:
            row["pass2_ab_error"] = repr(e)[:160]
        # fused-frame composition A/B (VERDICT r4 #2/#3): the same frame
        # as ONE jit (render_many) vs the ~10-dispatch per-pass loop.
        # r5a measured 2703 ms fused vs 2744 dispatch-composed (-1.5%):
        # there is NO pass-boundary tax; the row pins that in-artifact.
        if _left() > 240:
            frr.render_many(2)      # compile + warm
            t0 = time.perf_counter()
            frr.render_many(2)
            row["frame_s_batched"] = round((time.perf_counter() - t0) / 2, 3)
        extra["restir_garage_1080p"] = row

    _section(extra, "garage_1080p", est_s=420, fn=s_garage_1080p,
             required=True)

    # ---- converged DI RMSE vs the MIS-free DiOracle (BASELINE <=5e-3
    # accuracy bar; VERDICT r2 #5 / r4 #6).  The DiOracle consumes pass1's
    # own jitted primary-hit geometry (render/di_oracle.py) so the
    # comparison isolates the DI estimator chain from ulp-level geometry
    # divergence.  Frame counts are TIME-CAPPED, not fixed: the residual
    # at the bar is noise-dominated (r3: 8000/4000 frames @64^2 -> RMSE
    # 0.0017), so the loop renders chunks until its wall budget is spent
    # and records the frame counts actually reached.
    hcam = Camera(eye=(0.5, 0.5, 1.72), center=(0.5, 0.5, 0.0))

    def run_frames(r, budget_s, max_frames, chunk=500):
        """Accumulate frames in render_many chunks until the wall budget
        or max_frames is reached (frames are dispatch-overhead-bound at
        these resolutions — r5 run 1: 91 ms/frame wall for <1 ms of 64^2
        device work; batching restores convergence/second)."""
        t0 = time.perf_counter()
        done = 0
        while done < max_frames and time.perf_counter() - t0 < budget_s:
            r.render_many(chunk)
            done += chunk
        return done

    def s_rmse_di():
        from royaltracer_dx_tpu.render.di_oracle import DiOracle

        W3 = 64
        dora = DiOracle(cornell_box(emission=18.0), hcam,
                        RenderConfig(width=W3, height=W3))
        nf_o = run_frames(dora, budget_s=100.0, max_frames=12000)
        dimg = dora.radiance()
        rr3 = RestirRenderer(cornell_box(emission=18.0), hcam,
                             RenderConfig(width=W3, height=W3,
                                          aa_jitter=False, gi_bounces=0))
        nf_r = run_frames(rr3, budget_s=100.0, max_frames=8000)
        di_img = rr3.radiance()
        extra["rmse_di_vs_dioracle_64"] = {
            "rmse": round(rmse(di_img, dimg), 5),
            "rel_mean": round(rel_mean(di_img, dimg), 5),
            "frames": [nf_o, nf_r],
            "bar": 5e-3,
        }

    _section(extra, "rmse_di", est_s=340, fn=s_rmse_di, required=True)

    # ---- RMSE harness (full DI+GI vs quirk-free megakernel oracle)
    def s_rmse():
        from royaltracer_dx_tpu.render.renderer import Renderer

        W2 = 96
        orc = Renderer(cornell_box(emission=18.0), hcam,
                       RenderConfig(width=W2, height=W2, max_bounces=5,
                                    aa_jitter=False,
                                    reference_mis_quirk=False))
        nf_o = run_frames(orc, budget_s=90.0, max_frames=2000, chunk=100)
        ora = orc.radiance()
        rr2 = RestirRenderer(cornell_box(emission=18.0), hcam,
                             RenderConfig(width=W2, height=W2,
                                          aa_jitter=False))
        nf_r = run_frames(rr2, budget_s=70.0, max_frames=1000, chunk=100)
        img2 = rr2.radiance()
        extra["rmse_vs_oracle"] = {
            "rmse": round(rmse(img2, ora), 5),
            "rel_mean": round(rel_mean(img2, ora), 5),
            "frames": [nf_o, nf_r],
        }

    # ---- config 3 headline: 1M-triangle closest-hit (stream traversal)
    def s_terrain():
        from royaltracer_dx_tpu.utils.rng import pixel_seed  # noqa: F401

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
            # consume the FULL DXR-TraceRay-equivalent payload (t, u, v,
            # prim id): consuming t alone lets XLA's while-loop
            # simplifier delete the u/v/tri carries from the sweep and
            # the row silently measures find-mode (r5e/r5g — r3/r4
            # closest rows overstated throughput this way)
            h = st.closest_hit_stream_xla(o, dirs, accel)
            pay = (jnp.clip(h.t[:, None], 0.0, 1.0) + h.u[:, None]
                   + h.v[:, None] + h.tri[:, None].astype(jnp.float32)
                   * 1e-9)
            return o + pay * 1e-9
        dt = _slope(_closest_step, origins, label="terrain_closest")
        t_hit = st.closest_hit_stream_xla(origins, dirs, accel).t
        mrays_closest = n / dt / 1e6
        _partial["value"] = round(mrays_closest, 2)
        _partial["vs_baseline"] = round(mrays_closest / 100.0, 4)
        assert bool(np.isfinite(np.asarray(t_hit)).any())

        # the on-device build EXECUTION cost (the BLAS-build analog the
        # driver pays per scene); build_s_cold above includes the one-time
        # XLA compile, which the axon tunnel's remote compile service makes
        # minutes-slow and which re-fires whenever the remote lease
        # restarts (new backend version = new persistent-cache key)
        t0 = time.perf_counter()
        accel = st.build_stream_accel(tris)
        _sync(accel.top_lo)
        build_exec_s = time.perf_counter() - t0

        # realistic shadow batch: segments from the primary hit SURFACE
        # points (unclamped t — a t<=2 clamp floats most points in mid-air
        # and the batch degenerates to ~0% occlusion) to a light INSIDE
        # the hill field (~16% occluded).  The VERDICT r2 #4 comparison
        # (ShadowRay.hlsl should be the CHEAP query) is anyhit vs closest
        # ON THE SAME segments.
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
        occ_a = st.any_hit_stream_xla(p, ld, accel, 1e-3, tmax_s,
                                      presort=True)

        def _cs_step(o):
            h = st.closest_hit_stream_xla(o, ld, accel, 1e-3, tmax_s,
                                          presort=True)
            pay = (jnp.clip(h.t[:, None], 0.0, 1.0) + h.u[:, None]
                   + h.v[:, None] + h.tri[:, None].astype(jnp.float32)
                   * 1e-9)
            return o + pay * 1e-9
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
        state["tris"] = tris
        state["accel"] = accel
        state["origins"] = origins
        state["dirs"] = dirs
        state["order"] = order
        state["n"] = n
        state["mrays_closest"] = mrays_closest
        state["build_s"] = build_s

    _section(extra, "terrain", est_s=500, fn=s_terrain, required=True)
    _section(extra, "rmse", est_s=300, fn=s_rmse, required=True)

    # ======================= optional rows ===============================

    # ---- VERDICT r4 #7: sharded-renderer overhead on a 1-device mesh vs
    # the single-chip renderer at the same 256^2 config (multi-chip
    # correctness is equality-tested; this bounds its COST)
    def s_sharded_overhead():
        from royaltracer_dx_tpu.parallel.shard import ShardedRestirRenderer

        rscene, rcam = build_scene("reference")
        srr = ShardedRestirRenderer(rscene, rcam,
                                    RenderConfig(width=256, height=256),
                                    devices=jax.devices()[:1])
        srr.render()
        t0 = time.perf_counter()
        for _ in range(5):
            srr.render()
        sdt = (time.perf_counter() - t0) / 5
        f32 = extra.get("restir_garage_256", {}).get("frame_ms")
        row = {"frame_ms": round(sdt * 1e3, 2), "single_chip_ms": f32}
        if f32:
            row["overhead_frac"] = round(sdt * 1e3 / f32 - 1.0, 3)
        extra["sharded_1dev_256"] = row

    _section(extra, "sharded_overhead", est_s=240, fn=s_sharded_overhead)

    # ---- config 4: many-light ReSTIR (Sponza-class light count)
    def s_many_lights():
        from royaltracer_dx_tpu.scene.procedural import many_lights

        mcam2 = Camera(eye=(0.0, 1.1, 3.2), center=(0.0, 0.8, 0.0))
        # width/height/aa_jitter match the RMSE section's ReSTIR config so
        # the 96^2 ReSTIR sections share one compiled pipeline
        mrr = RestirRenderer(many_lights(), mcam2,
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

    _section(extra, "many_lights", est_s=150, fn=s_many_lights)

    # ---- config 5: dynamic scene — animated instance + refit + frame
    def s_dynamic():
        ascene, acam = build_scene("reference")
        arr = RestirRenderer(ascene, acam,
                             RenderConfig(width=96, height=96,
                                          aa_jitter=False))
        arr.render()
        t0 = time.perf_counter()
        for i in range(3):
            ang = 0.3 * (i + 1)
            c, s = float(np.cos(ang)), float(np.sin(ang))
            m = np.asarray([[c, 0, s, 0], [0, 1, 0, 0],
                            [-s, 0, c, 0], [0, 0, 0, 1]], np.float32)
            ascene.set_transform(1, m)
            arr.update()
            arr.render()
        adt = (time.perf_counter() - t0) / 3
        aimg = arr.radiance()
        assert np.isfinite(aimg).all()
        extra["dynamic_refit_frame_96_ms"] = round(adt * 1e3, 2)

    _section(extra, "dynamic", est_s=150, fn=s_dynamic)

    # ---- Sponza-class ReSTIR (generated atrium: 265k tris, 48 lamps)
    def s_sponza():
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

    _section(extra, "sponza", est_s=400, fn=s_sponza)

    # ---- build-quality comparison: device median (default quality build)
    # vs device morton (cheapest) — build time AND traversal throughput
    def s_build_quality():
        tris, origins, dirs = state["tris"], state["origins"], state["dirs"]
        t0 = time.perf_counter()
        accel_m = st.build_stream_accel(tris, method="morton")
        _sync(accel_m.top_lo)
        build_m = time.perf_counter() - t0

        def _cm_step(o, a=accel_m):
            h = st.closest_hit_stream_xla(o, dirs, a)
            pay = (jnp.clip(h.t[:, None], 0.0, 1.0) + h.u[:, None]
                   + h.v[:, None] + h.tri[:, None].astype(jnp.float32)
                   * 1e-9)
            return o + pay * 1e-9
        dt_m2 = _slope(_cm_step, origins, label="terrain_closest_morton")
        extra["build_quality_1m"] = {
            "median_build_s": round(state["build_s"], 3),
            "morton_build_s": round(build_m, 3),
            "median_closest_mrays": round(state["mrays_closest"], 2),
            "morton_closest_mrays": round(state["n"] / dt_m2 / 1e6, 2),
        }

    if "accel" in state:
        _section(extra, "build_quality", est_s=200, fn=s_build_quality)

    # ---- bunny / dragon traversal (BASELINE configs 3-4 named assets;
    # generated stand-ins at the same scale — scene/assets.py)
    def s_assets():
        from royaltracer_dx_tpu.scene.assets import ensure_asset
        from royaltracer_dx_tpu.scene.obj_loader import load_obj

        W = H = 512
        order = state["order"]
        n = state["n"]
        for aname, eye in (("bunny", (2.6, 1.8, 2.6)),
                           ("dragon", (6.5, 4.5, 6.5))):
            if _left() < 180:
                extra[f"{aname}_skipped"] = "budget"
                continue
            data = load_obj(ensure_asset(aname))
            atris = jnp.asarray(data["vertices"][data["indices"]])
            t0 = time.perf_counter()
            a_acc = st.build_stream_accel(atris)
            _sync(a_acc.top_lo)
            a_build = time.perf_counter() - t0
            acam = Camera(eye=eye, center=(0.0, 0.0, 0.0))
            aca = {k: jnp.asarray(vv)
                   for k, vv in acam.matrices(1.0).items()}
            ao, ad = generate_rays(aca, W, H)
            ao = ao[jnp.asarray(order)]
            ad = ad[jnp.asarray(order)]

            def _ac_step(o, a=a_acc, ad=ad):
                h = st.closest_hit_stream_xla(o, ad, a)
                pay = (jnp.clip(h.t[:, None], 0.0, 1.0) + h.u[:, None]
                       + h.v[:, None] + h.tri[:, None].astype(jnp.float32)
                       * 1e-9)
                return o + pay * 1e-9
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

    if "order" in state:
        _section(extra, "assets", est_s=180, fn=s_assets)

    # ---- device refit of the 1M structure (config 5's TLAS-refit analog)
    def s_refit():
        accel, tris = state["accel"], state["tris"]

        def _refit_step(t):
            a2 = st.refit_stream_accel(accel, t)
            return t + a2.top_lo[0, 0] * 1e-12
        dt_r = _slope(_refit_step, tris + 0.01, label="refit_1m")
        extra["refit_1m_ms"] = round(dt_r * 1e3, 2)

    if "accel" in state:
        _section(extra, "refit", est_s=120, fn=s_refit)

    # ---- config 1: cornell megakernel
    def s_cornell():
        from royaltracer_dx_tpu.render.megakernel import trace_paths_impl
        from royaltracer_dx_tpu.utils.rng import pixel_seed

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

    _section(extra, "cornell", est_s=120, fn=s_cornell)

    # ---- f16 at the 1080p operating point (VERDICT r4 #5: Δms + ΔRMSE at
    # both resolutions) — last: it recompiles the full 1080p pipeline
    def s_f16_1080p():
        frr16 = RestirRenderer(build_scene("reference")[0], state["rcam"],
                               RenderConfig(width=1920, height=1080,
                                            record_dtype="f16"))
        frr16.render()
        t0 = time.perf_counter()
        for _ in range(2):
            frr16.render()
        fdt16 = (time.perf_counter() - t0) / 2
        extra["f16_records_1080p"] = {
            "frame_s": round(fdt16, 3),
            "f32_frame_s": extra.get("restir_garage_1080p", {}).get("frame_s"),
        }

    _section(extra, "f16_1080p", est_s=300, fn=s_f16_1080p)

    extra["reps_ms"] = _ALL_REPS
    extra["total_s"] = round(time.perf_counter() - _T0, 1)
    wd.cancel()
    _emit(_partial)


if __name__ == "__main__":
    main()
