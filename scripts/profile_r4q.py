"""Round-4 part Q: flagship frame re-measure with the shipped r4 wins
(occlusion pair-doubling OFF everywhere, fused-batch grouping, plus the
epilogue default chosen by r4m2).  Per-pass profile at garage 256^2 and
1920x1080, channel means for the regression guard.

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
from royaltracer_dx_tpu.render.restir_renderer import RestirRenderer


def say(*a):
    print(*a, flush=True)


def run(W, H, frames=6):
    scene, camera = build_scene("reference")
    cfg = RenderConfig(width=W, height=H)
    r = RestirRenderer(scene, camera, cfg)
    t0 = time.perf_counter()
    r.render()
    jax.block_until_ready(r.fb.accum)
    say(f"  first frame (compile): {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(frames):
        t0 = time.perf_counter()
        r.render()
        jax.block_until_ready(r.fb.accum)
        times.append(time.perf_counter() - t0)
    best = min(times)
    say(f"  frame: {best*1e3:.1f} ms  fps {1.0/best:.2f}")
    r.profile = True
    r.render()
    jax.block_until_ready(r.fb.accum)
    r.render()
    jax.block_until_ready(r.fb.accum)
    pt = r.metrics.get("pass_times_s", {})
    say(f"  pass profile: { {k: round(v*1e3, 1) for k, v in pt.items()} }")
    r.profile = False
    img = np.asarray(r.radiance())
    say(f"  channel means: {[round(float(c), 4) for c in img.mean(axis=(0, 1))]}")


def main():
    say("device:", jax.devices()[0])
    say("=== garage 256^2 ===")
    run(256, 256, frames=8)
    say("=== garage 1080p ===")
    run(1920, 1080, frames=3)


if __name__ == "__main__":
    main()
