"""Headless CLI — the analog of Main.cpp + the Win32 message pump.

The reference's entry point constructs Renderer(1920, 1080) and pumps
OnUpdate/OnRender per WM_PAINT (Main.cpp:18-26, Win32Application.cpp:100-105)
with its default scene {garage.obj, monke.obj} and camera lookat
(-1.5, 1.5, 3.5) -> (0, 1, 0) (Renderer.cpp:46-48, :363).  This CLI runs the
same loop headless and writes PNG snapshots instead of presenting.

Usage:
  python -m royaltracer_dx_tpu.cli --scene cornell --frames 64 --out out.png
  python -m royaltracer_dx_tpu.cli --scene reference --renderer restir \
      --width 1920 --height 1080 --frames 100 --snapshot-every 25
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REFERENCE_INCLUDE = "/root/reference/Pathtracer/include"


def build_scene(name: str):
    from royaltracer_dx_tpu.camera import Camera
    from royaltracer_dx_tpu.scene.procedural import (
        cornell_box,
        many_lights,
        menger_sponge,
    )
    from royaltracer_dx_tpu.scene.scene import Scene

    if name == "cornell":
        return cornell_box(emission=18.0), Camera(
            eye=(0.5, 0.5, 1.72), center=(0.5, 0.5, 0.0)
        )
    if name == "reference":
        # the reference's hardcoded scene: garage + monke, identity instances
        s = Scene()
        for model in ("garage.obj", "monke.obj"):
            mesh = s.add_obj(os.path.join(REFERENCE_INCLUDE, model))
            s.add_instance(mesh)
        return s, Camera(eye=(-1.5, 1.5, 3.5), center=(0.0, 1.0, 0.0))
    if name == "many_lights":
        return many_lights(), Camera(eye=(0.0, 1.1, 3.2), center=(0.0, 0.8, 0.0))
    if name in ("sponza", "bunny", "dragon"):
        # generated Sponza/bunny/dragon-class assets (see scene/assets.py —
        # zero-egress stand-ins at the named workloads' scale)
        from royaltracer_dx_tpu.scene.assets import ensure_asset

        s = Scene()
        if name == "sponza":
            mesh = s.add_obj(ensure_asset("sponza_atrium"))
            s.add_instance(mesh)
            return s, Camera(eye=(-9.5, 2.2, 0.0), center=(6.0, 3.4, 0.0))
        mesh = s.add_obj(ensure_asset(name))
        s.add_instance(mesh)
        lo = s.meshes[mesh].vertices.min(axis=0)
        hi = s.meshes[mesh].vertices.max(axis=0)
        ground_y = float(lo[1]) - 0.02
        ext = float(max(hi[0] - lo[0], hi[2] - lo[2])) * 2.0
        grey = s.add_material(kd=(0.55, 0.55, 0.55, 1.0))
        light = s.add_material(ke=(18.0, 17.0, 15.0))
        gv = np.array([[-ext, ground_y, -ext], [ext, ground_y, -ext],
                       [ext, ground_y, ext], [-ext, ground_y, ext]],
                      np.float32)
        gm = s.add_mesh(gv, np.asarray([[0, 2, 1], [0, 3, 2]], np.int32),
                        tri_material=np.asarray([grey, grey], np.int32))
        s.add_instance(gm)
        ly = float(hi[1]) + 0.35 * ext
        lv = np.array([[-0.25 * ext, ly, -0.25 * ext],
                       [0.25 * ext, ly, -0.25 * ext],
                       [0.25 * ext, ly, 0.25 * ext],
                       [-0.25 * ext, ly, 0.25 * ext]], np.float32)
        lm = s.add_mesh(lv, np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
                        tri_material=np.asarray([light, light], np.int32))
        s.add_instance(lm)
        size = float(np.linalg.norm(hi - lo))
        c = 0.5 * (lo + hi)
        return s, Camera(eye=(float(c[0]) + 0.9 * size, float(c[1]) + 0.45 * size,
                              float(c[2]) + 0.9 * size),
                         center=(float(c[0]), float(c[1]), float(c[2])))
    if name == "menger":
        s = Scene()
        v, idx = menger_sponge(2)
        white = s.add_material(kd=(0.7, 0.7, 0.7, 1.0), ks=(0, 0, 0))
        light = s.add_material(ke=(20.0, 20.0, 20.0))
        mesh = s.add_mesh(v, idx, tri_material=np.full(len(idx), white, np.int32))
        s.add_instance(mesh)
        lv = np.array([[0.2, 1.4, 0.2], [0.8, 1.4, 0.2], [0.8, 1.4, 0.8],
                       [0.2, 1.4, 0.8]], np.float32)
        lm = s.add_mesh(lv, np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
                        tri_material=np.asarray([light, light], np.int32))
        s.add_instance(lm)
        return s, Camera(eye=(2.2, 1.6, 2.2), center=(0.5, 0.5, 0.5))
    raise SystemExit(
        f"unknown scene {name!r} (cornell | reference | many_lights | menger"
        " | sponza | bunny | dragon)")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--renderer", default="restir", choices=("restir", "megakernel"))
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--bvh", action="store_true", help="use the LBVH tracer")
    ap.add_argument("--traversal", default="",
                    choices=("", "brute", "cluster", "bvh"),
                    help="acceleration scheme (default: brute; 'cluster' = "
                         "the TPU tile-clustered traversal for big scenes)")
    ap.add_argument("--out", default="render.png")
    ap.add_argument("--snapshot-every", type=int, default=0)
    ap.add_argument("--checkpoint", default="", help="save/resume state npz")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--devices", type=int, default=1,
                    help="shard the ReSTIR render over N devices "
                         "(pixel-band data parallelism)")
    ap.add_argument("--animate", action="store_true",
                    help="rotate instance 1 per frame (the reference's "
                         "OnUpdate animation, Renderer.cpp:444-449)")
    ap.add_argument("--aov", default="", metavar="CHANNEL",
                    help="also write AOV debug channels (the reference's "
                         "'C'-key 30-layer cycling, Renderer.cpp:690-698): "
                         "a channel name or 'all'")
    ap.add_argument("--profile", default="",
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--seed-mode", default="frame", choices=("frame", "time"),
                    help="TEA seed time term: frame counter (deterministic)"
                         " or wall-clock nanos (the reference's behavior)")
    args = ap.parse_args(argv)

    if args.cpu:
        if args.devices > 1:
            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={args.devices}"
                ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import royaltracer_dx_tpu  # noqa: F401 (precision config)
    import royaltracer_dx_tpu.cache  # noqa: F401 (compile cache)
    from royaltracer_dx_tpu.config import RenderConfig
    from royaltracer_dx_tpu.io.checkpoint import load_renderer_state, save_renderer_state
    from royaltracer_dx_tpu.render.renderer import Renderer
    from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer
    from royaltracer_dx_tpu.utils.image import write_png

    cfg = RenderConfig(
        width=args.width, height=args.height, max_bounces=args.bounces,
        use_bvh=args.bvh,
        traversal=args.traversal or "auto",
        seed_mode=args.seed_mode,
    )
    scene, camera = build_scene(args.scene)
    if args.devices > 1 and args.renderer == "restir":
        import jax

        from royaltracer_dx_tpu.parallel.shard import ShardedRestirRenderer

        devs = jax.devices()[: args.devices]
        if len(devs) < args.devices:
            raise SystemExit(
                f"--devices {args.devices} but only {len(devs)} present")
        r = ShardedRestirRenderer(scene, camera, cfg, devices=devs)
    else:
        cls = RestirRenderer if args.renderer == "restir" else Renderer
        r = cls(scene, camera, cfg)
    if args.checkpoint and os.path.exists(args.checkpoint):
        load_renderer_state(args.checkpoint, r)
        print(f"resumed from {args.checkpoint} at frame {r.frame}")

    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)

    t_start = time.perf_counter()
    for i in range(args.frames):
        if args.animate and len(scene.instance_mesh) > 1:
            ang = 1.57 * (i + 1) / max(args.frames, 1)
            c, sn = np.cos(ang), np.sin(ang)
            rot = np.array([[c, 0, sn, 0], [0, 1, 0, 0],
                            [-sn, 0, c, 0], [0, 0, 0, 1]], np.float32)
            scene.set_transform(1, rot)
            r.update()
        r.render()
        if i == 0 or (i + 1) % 10 == 0:
            m = r.metrics
            extra = f" {m['mrays_per_s']:.2f} Mrays/s" if "mrays_per_s" in m else ""
            print(f"frame {r.frame}: {m['frame_time_s']*1e3:.1f} ms"
                  f" ({m['fps']:.1f} fps){extra}", flush=True)
        if args.snapshot_every and (i + 1) % args.snapshot_every == 0:
            base, ext = os.path.splitext(args.out)
            write_png(f"{base}_{r.frame:05d}{ext or '.png'}", r.image())
    if args.profile:
        import jax

        jax.profiler.stop_trace()
        print(f"profiler trace -> {args.profile}")
    write_png(args.out, r.image())
    if args.checkpoint:
        save_renderer_state(args.checkpoint, r)
        print(f"checkpoint -> {args.checkpoint}")
    dt = time.perf_counter() - t_start
    print(f"{args.frames} frames in {dt:.1f}s -> {args.out}")

    if args.aov:
        import numpy as np

        from royaltracer_dx_tpu.render.aov import CHANNELS, render_aovs

        cam_arrays = r._camera_arrays()
        aovs = render_aovs(r.scene_arrays, cam_arrays, cfg)
        wanted = CHANNELS if args.aov == "all" else (args.aov,)
        base, ext = os.path.splitext(args.out)
        for ch in wanted:
            img = np.asarray(aovs[ch]).reshape(cfg.height, cfg.width, -1)
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            lo, hi = float(img.min()), float(img.max())
            img = (img - lo) / max(hi - lo, 1e-9)
            write_png(f"{base}.{ch}{ext}", img[..., :3])
            print(f"aov {ch} -> {base}.{ch}{ext}")


if __name__ == "__main__":
    main()
