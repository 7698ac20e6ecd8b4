"""Top-level Renderer: the OnInit/OnUpdate/OnRender loop, headless.

Replaces the reference's Renderer class + Win32 frame loop
(Renderer.cpp:44-103 OnInit, :431-452 OnUpdate, :468-506 OnRender,
Win32Application.cpp:100-105 WM_PAINT pump) with an explicit functional
step.  Camera-motion accumulation reset follows RayGen.hlsl:161-177 (view
matrices differ by > s_bias anywhere).

Dispatch strategy: the frame is three small jitted stages — ray/seed
prologue, a single-bounce step called max_bounces times, and the
accumulate epilogue.  One bounce-step compilation is reused for every
bounce of every frame (XLA compile time grows superlinearly in traced
body repetitions, so this beats a monolithic unrolled frame by ~10x
compile time at identical steady-state throughput).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from royaltracer_dx_tpu.camera import Camera, generate_rays
from royaltracer_dx_tpu.config import RenderConfig, S_BIAS
from royaltracer_dx_tpu.render import megakernel
from royaltracer_dx_tpu.render.framebuffer import Framebuffer, accumulate, resolve
from royaltracer_dx_tpu.scene.scene import Scene
from royaltracer_dx_tpu.utils.rng import pixel_seed, tea_random


@functools.partial(jax.jit, static_argnames=("cfg", "spp_jitter", "sample_index"))
def frame_prologue(cam: dict, frame: jax.Array, cfg: RenderConfig,
                   spp_jitter: bool = True, sample_index: int = 0):
    """Camera rays + per-pixel seeds for one sample pass."""
    w, h = cfg.width, cfg.height
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    xs = xs.ravel()
    ys = ys.ravel()
    # stream id = samples+1 (RayGen.hlsl:81-82 uses uint(samples+1))
    seed = pixel_seed(xs, ys, cfg.samples_per_pixel + 1, frame + sample_index)
    jx, seed = tea_random(seed)
    jy, seed = tea_random(seed)
    jitter = jnp.stack([jx, jy], axis=-1) if spp_jitter else None
    origins, dirs = generate_rays(cam, w, h, jitter)
    return megakernel.init_path_state(origins, dirs, seed)


@functools.partial(jax.jit, static_argnames=("cfg",))
def frame_epilogue(fb: Framebuffer, emission_sum: jax.Array, cam_view: jax.Array,
                   prev_view: jax.Array, cfg: RenderConfig):
    sample = emission_sum / cfg.samples_per_pixel
    changed = jnp.any(jnp.abs(cam_view - prev_view) > S_BIAS)
    return accumulate(fb, sample, changed, cfg.max_accum_frames)


@functools.partial(jax.jit, static_argnames=("cfg", "k"),
                   donate_argnums=(1,))
def _render_frames(scene, fb: Framebuffer, cam: dict, frame0: jax.Array,
                   prev_view: jax.Array, cfg: RenderConfig, k: int):
    """k megakernel frames in one jit: per frame, samples_per_pixel
    passes of (prologue -> max_bounces bounce steps) accumulated, then
    the epilogue — identical math to k render() calls."""
    def one_frame(i, fb):
        frame = frame0 + i.astype(jnp.uint32)

        def one_sample(s, emission):
            # render() passes sample_index=s (static); the prologue only
            # uses it as `frame + sample_index` in the seed, so the
            # traced equivalent adds s to the frame term
            st = frame_prologue.__wrapped__(cam, frame + s.astype(jnp.uint32),
                                            cfg, cfg.aa_jitter, 0)
            st = jax.lax.fori_loop(
                0, cfg.max_bounces,
                lambda b, st: megakernel.bounce_step_jit(
                    scene, st, b.astype(jnp.uint32), cfg), st)
            return emission + st["emission"]

        emission = jax.lax.fori_loop(
            0, cfg.samples_per_pixel, one_sample,
            jnp.zeros((cfg.num_pixels, 3), jnp.float32))
        this_prev = jnp.where(i == 0, prev_view, cam["view"])
        return frame_epilogue.__wrapped__(fb, emission, cam["view"],
                                          this_prev, cfg)

    return jax.lax.fori_loop(0, k, one_frame, fb)


class Renderer:
    """Progressive headless renderer (megakernel backend).

    Usage:
      r = Renderer(scene, camera, cfg)
      for _ in range(frames): r.render()
      img = r.image()
    """

    def __init__(self, scene: Scene, camera: Camera, cfg: RenderConfig):
        self.scene = scene
        self.camera = camera
        self.cfg = cfg
        self.materials = scene.build_materials()
        self.scene_arrays = scene.flatten(
            self.materials, build_bvh=cfg.accel == "bvh",
            bvh_leaf_size=cfg.bvh_leaf_size,
            build_clusters=cfg.accel == "cluster",
            cluster_group=cfg.cluster_group,
            build_stream=_wants_stream(scene, cfg),
        )
        self.fb = Framebuffer.create(cfg.num_pixels)
        self.frame = 0
        self._prev_view = jnp.zeros((4, 4), jnp.float32)
        self.metrics: dict = {}

    def _camera_arrays(self) -> dict:
        mats = self.camera.matrices(self.cfg.width / self.cfg.height)
        return {k: jnp.asarray(v) for k, v in mats.items()}

    def update(self, camera: Camera | None = None):
        """OnUpdate analog: move camera / animate instances, then refit
        (BVH topology is kept, bounds recomputed — the TLAS-refit analog)."""
        if camera is not None:
            self.camera = camera
        self.scene_arrays = self.scene.flatten(self.materials, prev=self.scene_arrays)

    def render(self) -> None:
        """OnRender analog: trace one frame and accumulate."""
        cfg = self.cfg
        cam = self._camera_arrays()
        t0 = time.perf_counter()
        emission = None
        rays = 0.0
        for s in range(cfg.samples_per_pixel):
            st = frame_prologue(cam, jnp.uint32(self.frame), cfg,
                                cfg.aa_jitter, s)
            for bounce in range(cfg.max_bounces):
                st = megakernel.bounce_step_jit(
                    self.scene_arrays, st, jnp.uint32(bounce), cfg
                )
            emission = st["emission"] if emission is None else emission + st["emission"]
            rays += float(st["rays"])
        self.fb = frame_epilogue(self.fb, emission, cam["view"], self._prev_view, cfg)
        self.fb.accum.block_until_ready()
        dt = time.perf_counter() - t0
        self._prev_view = cam["view"]
        self.frame += 1
        self.metrics = dict(
            frame_time_s=dt,
            fps=1.0 / max(dt, 1e-9),
            frame=self.frame,
            rays_traced=rays,
            mrays_per_s=rays / dt / 1e6,
        )

    def render_many(self, k: int) -> None:
        """Render k frames in ONE jit dispatch (see
        RestirRenderer.render_many; small frames are dispatch-bound).
        Camera static across the batch; per-frame ray metrics skipped."""
        cfg = self.cfg
        cam = self._camera_arrays()
        t0 = time.perf_counter()
        self.fb = _render_frames(self.scene_arrays, self.fb, cam,
                                 jnp.uint32(self.frame), self._prev_view,
                                 cfg, int(k))
        self.fb.accum.block_until_ready()
        dt = time.perf_counter() - t0
        self._prev_view = cam["view"]
        self.frame += int(k)
        self.metrics = dict(frame_time_s=dt / max(k, 1),
                            fps=k / max(dt, 1e-9), frame=self.frame,
                            batch_frames=int(k), batch_time_s=dt)

    def image(self, srgb: bool = True) -> np.ndarray:
        """Resolved [H, W, 3] image in [0,1]."""
        img = resolve(self.fb, srgb=srgb)
        return np.asarray(img).reshape(self.cfg.height, self.cfg.width, 3)

    def radiance(self) -> np.ndarray:
        """Linear accumulated radiance [H, W, 3] (for RMSE tests)."""
        out = self.fb.accum / np.maximum(np.asarray(self.fb.count), 1.0)[:, None]
        return np.asarray(out).reshape(self.cfg.height, self.cfg.width, 3)


def _wants_stream(scene, cfg) -> bool:
    """Build the stream accel for traversal="stream" or a big-scene auto."""
    from royaltracer_dx_tpu.config import STREAM_AUTO_MIN_TRIS

    if cfg.accel == "stream":
        return True
    return cfg.accel == "auto" and scene.num_triangles >= STREAM_AUTO_MIN_TRIS
