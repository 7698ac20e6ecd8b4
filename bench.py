"""Benchmark driver: prints ONE JSON line with the headline metric.

Round-1 configuration: BASELINE.md config 1 — Cornell box megakernel at
512x512, progressive frames — measuring wavefront ray throughput
(Mrays/sec/chip, closest-hit + shadow rays counted inside the kernel)
against the BASELINE.json north-star target of 100 Mrays/sec/chip.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from royaltracer_dx_tpu import cache  # noqa: F401
    from royaltracer_dx_tpu.camera import Camera, generate_rays
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.render.megakernel import trace_paths_impl
    from royaltracer_dx_tpu.scene.procedural import cornell_box
    from royaltracer_dx_tpu.utils.rng import pixel_seed

    width = height = 512
    cfg = RenderConfig(width=width, height=height, max_bounces=5)
    scene = cornell_box().flatten()
    cam = Camera(eye=(0.5, 0.6, 2.2), center=(0.5, 0.5, 0.0))
    ca = {k: jnp.asarray(v) for k, v in cam.matrices(1.0).items()}
    origins, dirs = generate_rays(ca, width, height)
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    xs = jnp.asarray(xs.ravel())
    ys = jnp.asarray(ys.ravel())

    step = jax.jit(lambda o, d, s: trace_paths_impl(scene, o, d, s, cfg))

    # warmup/compile
    seeds = pixel_seed(xs, ys, 2, jnp.uint32(0))
    radiance, rays = step(origins, dirs, seeds)
    radiance.block_until_ready()

    frames = 8
    total_rays = 0.0
    t0 = time.perf_counter()
    for f in range(1, frames + 1):
        seeds = pixel_seed(xs, ys, 2, jnp.uint32(f))
        radiance, rays = step(origins, dirs, seeds)
    radiance.block_until_ready()
    dt = time.perf_counter() - t0
    total_rays = float(rays) * frames  # rays/frame is seed-invariant to ~1%

    mrays = total_rays / dt / 1e6
    spp_per_sec = frames / dt * (width * height) / (1920 * 1080)

    # flagship ReSTIR DI+GI pipeline on the reference's shipped scene
    restir_extra = {}
    try:
        from royaltracer_dx_tpu.cli import build_scene
        from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer

        rscene, rcam = build_scene("reference")
        rr = RestirRenderer(rscene, rcam, RenderConfig(width=256, height=256))
        rr.render()  # compile
        t0 = time.perf_counter()
        for _ in range(5):
            rr.render()
        rdt = (time.perf_counter() - t0) / 5
        # TPU smoke check (the CPU suite can't see TPU-only numeric bugs,
        # e.g. denormal flush): the garage render must keep its material
        # colors — distinct per-channel means — and stay finite
        img = rr.radiance()
        ch = img.mean(axis=(0, 1))
        assert np.isfinite(img).all(), "non-finite radiance on TPU"
        assert float(ch.std()) > 1e-3 * max(float(ch.mean()), 1e-6), (
            f"gray render on TPU (channel means {ch}) — material ids lost?")
        restir_extra = {
            "restir_garage_256_frame_ms": round(rdt * 1e3, 2),
            "restir_garage_256_fps": round(1.0 / rdt, 2),
            "restir_channel_means": [round(float(c), 4) for c in ch],
        }
    except Exception as e:  # bench must still emit its line
        restir_extra = {"restir_error": repr(e)[:200]}

    print(json.dumps({
        "metric": "Mrays/sec/chip megakernel cornell 512x512 (5 bounces, RIS-10 NEE)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "extra": {
            "frame_time_ms": round(dt / frames * 1e3, 3),
            "spp_per_sec_1080p_equiv": round(spp_per_sec, 3),
            "rays_per_frame": round(total_rays / frames),
            "device": str(jax.devices()[0]),
            **restir_extra,
        },
    }))


if __name__ == "__main__":
    main()
